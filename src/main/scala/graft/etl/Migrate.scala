package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Append-only schema evolution (reference: logging-service/app/migrate.py:
  * 32-76): the physical column layout of a silver table is an ordered list of
  * flattened paths; evolution may only APPEND new paths — never drop or
  * reorder — guaranteeing old Parquet stays readable
  * (reference: logging-service/README.md:31-33).
  */
object Migrate {

  /** Paths present in `next` but not in `prev`, in `next`'s schema order
    * (the reference walks schemas in dependency-topological order,
    * migrate.py:38-42; a StructType walk is already topological — children
    * are visited within their parent).
    */
  def addedPaths(prev: StructType, next: StructType): Seq[String] = {
    val old = Flatten.columnPaths(prev).toSet
    Flatten.columnPaths(next).filterNot(old)
  }

  /** Evolve a stored ordered column list against a new schema: existing
    * entries keep their position, new paths append (migrate.py:59-72,
    * `write_mode="a"`). Throws if the new schema dropped a stored path —
    * dropping columns is forbidden by the contract.
    */
  def evolve(stored: Seq[String], next: StructType): Seq[String] = {
    val nextPaths = Flatten.columnPaths(next)
    val nextSet = nextPaths.toSet
    val dropped = stored.filterNot(nextSet)
    require(dropped.isEmpty,
      s"append-only migration violated: schema dropped columns ${dropped.mkString(", ")}")
    stored ++ nextPaths.filterNot(stored.toSet)
  }

  /** Serialize / parse the column list (the `<table>_columns.csv` analog,
    * one path per line).
    */
  def render(paths: Seq[String]): String = paths.mkString("\n") + "\n"
  def parseList(text: String): Seq[String] =
    text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Read silver Parquet written under an older column list: missing (newly
    * appended) columns are null-filled, and column order follows `paths` —
    * the M3 read path. Equivalent to parquet `mergeSchema` but with the
    * contract, not file footers, as the source of truth (cheap at 100 TB:
    * no footer-merge job).
    */
  def readWithColumns(spark: SparkSession, path: String, paths: Seq[String],
                      types: Map[String, DataType]): DataFrame = {
    val df = spark.read.parquet(path)
    val present = df.columns.toSet
    val cols = paths.map { p =>
      if (present(p)) col(p)
      else lit(null).cast(types.getOrElse(p, StringType)).as(p)
    }
    df.select(cols: _*)
  }
}
