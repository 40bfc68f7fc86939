package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column ⇄ catalyst Expression converters —
  * the supported hook point for libraries adding native expressions on
  * Spark 4's unified Column API (same trick every Spark-extension library
  * uses; no Spark internals are modified).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
