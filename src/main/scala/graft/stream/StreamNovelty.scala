package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming NOVELTY monitor — the live twin of the batch `vocab_growth`
  * readout: how much genuinely new content each window of the ingest
  * stream contributes. A crawl that starts re-fetching mirrors shows up
  * as the new-shingle rate collapsing toward zero while the raw event
  * rate stays flat — the signal that dedup spend should go up and crawl
  * spend should go down.
  *
  * Shape: explode 5-gram shingles (doc-local), keep the FIRST arrival of
  * each shingle hash within the watermark horizon
  * (`dropDuplicatesWithinWatermark` — 32 bytes of state per distinct
  * shingle, GC'd at the watermark like [[StreamDedup]]), then count
  * survivors per tumbling event-time window. Two chained stateful
  * operators under one watermark; state is bounded by distinct shingles
  * per horizon, never by history.
  */
object StreamNovelty {

  def newShingleCounts(docs: DataFrame, shingleLen: Int = 5,
                       textCol: String = "text", tsCol: String = "ts",
                       watermark: String = "10 minutes",
                       windowLen: String = "1 minute"): DataFrame =
    docs
      .select(col(tsCol).as("ts"),
        explode(graft.llm.Dedup.shingles(
          graft.llm.TextStats.tokens(col(textCol)), shingleLen)).as("_sh"))
      .withColumn("_shh", sha2(col("_sh"), 256))
      .drop("_sh") // the text never enters the state store
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("_shh")
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_new_shingles"))
      .select(col("window.start").as("window_start"), col("n_new_shingles"))
}
