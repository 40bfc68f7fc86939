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
}
