package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze log sources (reference: the SQLite `(ts, data)` event log,
  * logging-service/app/lib/storage.py:31 — the storage engine is an
  * implementation detail; the semantic contract is "timestamped raw JSON
  * rows"). Batch and streaming readers share one schema so the same Etl
  * pipeline runs over either.
  */
object Sources {

  val bronzeSchema = "ts LONG, data STRING"

  /** Batch read of a JSON-lines bronze log directory/file. The explicit
    * schema skips the inference pass (one scan, not two) and keeps `data`
    * as the raw document string.
    */
  def bronzeJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(bronzeSchema).json(path)

  /** Streaming read of the same layout — new files are micro-batches; pair
    * with Etl.parse/flatten and a parquet sink for continuous ingestion.
    */
  def bronzeJsonStream(spark: SparkSession, path: String,
                       maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.schema(bronzeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** CSV read with an EXPLICIT schema (inference would cost a second scan
    * and can mis-type sparse columns) — header + RFC-4180 quoting, the
    * third source format beside parquet and JSON lines. `multiLine` stays
    * off: quoted embedded newlines would force whole-file parsing and kill
    * split-ability, so upstream writers must escape them ([[writeCsv]]
    * round-trips everything else).
    */
  def csv(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** The matching writer: header + quoting-when-needed. */
  def writeCsv(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
