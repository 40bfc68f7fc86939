package org.apache.spark.sql.graftbridge

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge into Spark's own DSv2 parquet implementation (`private[sql]`
  * surface): the graft snapshot connector prunes FILES from its
  * zone-map/bloom manifest, then delegates the actual reading — batch
  * planning, vectorized decode, row-group pushdown, column pruning — to
  * a `ParquetTable` built over exactly the pruned file list. The
  * connector owns WHAT to read; Spark's battle-tested parquet scan owns
  * HOW.
  */
object ParquetDelegate {

  /** A parquet ScanBuilder over exactly `files`, reading with the
    * explicit `schema` (old snapshot files null-fill evolved columns).
    */
  def scanBuilder(spark: SparkSession, files: Seq[String],
                  schema: StructType,
                  options: Map[String, String]): ScanBuilder = {
    val cism = new CaseInsensitiveStringMap(options.asJava)
    ParquetTable("graft-snapshot-delegate", spark, cism, files,
      Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(cism)
  }

  /** Forward the connector's pushdown state into the delegate: required
    * columns prune the read schema, and the supported subset of the
    * data filters reaches the parquet reader (row-group/page skipping —
    * the second pruning tier below the connector's file-level one). The
    * public `pushFilters(Seq[Expression])` entry point wants RESOLVED
    * catalyst expressions, so the v1 filters are rebuilt against the
    * read schema. Returns the built Scan.
    */
  def buildPruned(builder: ScanBuilder, required: StructType,
                  filters: Array[Filter], schema: StructType): Scan = {
    builder match {
      case f: FileScanBuilder =>
        f.pruneColumns(required)
        f.pushFilters(filters.flatMap(toCatalyst(schema, _)).toSeq)
      case _ => ()
    }
    builder.build()
  }

  /** A ready Batch over exactly `files` — the streaming source's
    * per-window planner (and its file-agnostic reader factory).
    */
  def batchFor(spark: SparkSession, files: Seq[String],
               schema: StructType)
      : org.apache.spark.sql.connector.read.Batch =
    scanBuilder(spark, files, schema, Map.empty).build().toBatch

  private def toCatalyst(schema: StructType, f: Filter)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def attr(n: String): Option[ce.AttributeReference] =
      schema.find(_.name == n).map(sf =>
        ce.AttributeReference(n, sf.dataType, sf.nullable)())
    def lit(a: ce.AttributeReference, v: Any) =
      ce.Literal.create(v, a.dataType)
    f match {
      case org.apache.spark.sql.sources.EqualTo(a, v) =>
        attr(a).map(ar => ce.EqualTo(ar, lit(ar, v)))
      case org.apache.spark.sql.sources.GreaterThan(a, v) =>
        attr(a).map(ar => ce.GreaterThan(ar, lit(ar, v)))
      case org.apache.spark.sql.sources.GreaterThanOrEqual(a, v) =>
        attr(a).map(ar => ce.GreaterThanOrEqual(ar, lit(ar, v)))
      case org.apache.spark.sql.sources.LessThan(a, v) =>
        attr(a).map(ar => ce.LessThan(ar, lit(ar, v)))
      case org.apache.spark.sql.sources.LessThanOrEqual(a, v) =>
        attr(a).map(ar => ce.LessThanOrEqual(ar, lit(ar, v)))
      case _ => None
    }
  }
}
