package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Partitioned-layout plumbing for the persisted index artifacts (BM25
  * postings, IVF vector/code layouts, the near-dup pairs index).
  *
  * A `partitionBy` write of an EMPTY relation produces no data files at
  * all, so a later `spark.read.parquet(path)` fails with
  * UNABLE_TO_INFER_SCHEMA — an empty corpus would brick every probe of
  * the artifact. The writer therefore drops a `_schema.json` marker
  * (Spark's own `StructType.json`, partition column included) beside the
  * layout, and the reader supplies it explicitly: an empty layout reads
  * back as a valid empty relation with the exact build-time schema, and
  * a non-empty one reads identically to a plain `read.parquet` (explicit
  * schemas also skip footer-based inference — one less listing pass).
  */
object Layouts {

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_schema.json")

  /** Write `df` partitioned by `partCol` plus the schema marker. */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
                       mode: String = "overwrite"): Unit = {
    df.write.mode(mode).partitionBy(partCol).parquet(path)
    val fs = markerPath(path).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(markerPath(path), true)
    try out.write(df.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a layout written by [[writePartitioned]]: the marker schema is
    * applied when present (surviving the zero-file empty case); a layout
    * from an older build without a marker falls back to inference.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = markerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val json = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      spark.read.schema(DataType.fromJson(json).asInstanceOf[StructType])
        .parquet(path)
    } else spark.read.parquet(path)
  }
}
