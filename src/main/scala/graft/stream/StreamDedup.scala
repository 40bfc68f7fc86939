package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous corpus ingest — the
  * stream-shaped twin of [[graft.llm.Dedup.exact]]: a document that arrives
  * more than once (retries, multi-source crawls) must reach silver once.
  *
  * State is keyed on sha2(text) — 32 bytes per distinct document, the text
  * itself never enters the state store — and bounded by the watermark:
  * `dropDuplicatesWithinWatermark` keeps a key only while a duplicate could
  * still legally arrive, then GCs it. Unbounded-state `dropDuplicates` on a
  * raw stream is the canonical streaming scale-killer; this shape holds at
  * any corpus size because state ∝ distinct docs per watermark window, not
  * per history.
  */
object StreamDedup {

  def exact(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
            watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
