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

  // ---- persisted schema-version snapshots ----
  // The openapi.json analog (reference: logging-service/app/lib/
  // jsonschema.py:52-56, written by migrate.py:76): every migration writes
  // <dir>/v<N>/schema.json (the full StructType as JSON) next to
  // <dir>/v<N>/columns.txt (the ordered flattened column list), so the next
  // migration — possibly in a different job on a different machine — is
  // driven purely from disk state. Files go through the Hadoop FileSystem
  // API (local path, HDFS, or object store alike); they are a few KB of
  // driver-side metadata, never data-sized.

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(spark: SparkSession, path: String, text: String): Unit = {
    val out = fs(spark, path).create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readFile(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Write the version-`n` snapshot: full schema JSON + ordered column list. */
  def saveVersion(spark: SparkSession, dir: String, version: Int,
                  schema: StructType, paths: Seq[String]): Unit = {
    writeFile(spark, s"$dir/v$version/schema.json", schema.json)
    writeFile(spark, s"$dir/v$version/columns.txt", render(paths))
  }

  /** Load the version-`n` snapshot back: `(schema, ordered column paths)`. */
  def loadVersion(spark: SparkSession, dir: String, version: Int): (StructType, Seq[String]) =
    (DataType.fromJson(readFile(spark, s"$dir/v$version/schema.json")).asInstanceOf[StructType],
      parseList(readFile(spark, s"$dir/v$version/columns.txt")))

  /** Highest persisted version under `dir`, if any. */
  def latestVersion(spark: SparkSession, dir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .maxOption
  }

  /** Migrate `dir` to `next` purely from disk state: loads the latest
    * snapshot (none → version 1), evolves the stored column list
    * append-only (throws if `next` dropped a stored path), writes the new
    * snapshot, and returns `(new version, evolved column list)`.
    */
  def migrateFromDisk(spark: SparkSession, dir: String, next: StructType): (Int, Seq[String]) =
    latestVersion(spark, dir) match {
      case None =>
        val paths = Flatten.columnPaths(next)
        saveVersion(spark, dir, 1, next, paths)
        (1, paths)
      case Some(v) =>
        val (_, stored) = loadVersion(spark, dir, v)
        val evolved = evolve(stored, next)
        saveVersion(spark, dir, v + 1, next, evolved)
        (v + 1, evolved)
    }

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
