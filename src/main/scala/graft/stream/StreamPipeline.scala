package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** The streaming corpus-curation stage end to end — the stream-shaped twin
  * of [[graft.Pipeline]]'s batch story, composed from the library's
  * streaming operators in ONE readStream→writeStream stage per sink:
  *
  *   raw doc stream → [[StreamDedup.exact]] (watermark-GC'd 32-byte state)
  *     → [[graft.llm.TextStats.gopherFilter]] (doc-local, zero shuffle)
  *     → three readouts: the curated silver stream, junk-flooding source
  *       detection ([[StreamHeavyHitters]] over DROPPED docs), and
  *       windowed drop alerts ([[DqAlerts]]).
  *
  * All state is bounded: dedup keys live one watermark window, heavy-hitter
  * counters are one long per source (TTL-expirable), alert windows close at
  * the watermark. A restart from the checkpoint resumes exactly — the
  * recovery spec kills the stage between batches and asserts cross-restart
  * dedup plus sequential-run parity on every sink.
  */
object StreamPipeline {

  /** The crawl front door for streams — the stage-0a/0b twin of
    * [[graft.llm.Curation.run]]'s batch front door, and deliberately
    * STATELESS: HTML extraction and URL canonicalization are pure
    * columnar projections, so they compose with any downstream stateful
    * operator without adding state or watermark interactions; [[curate]]
    * chains a canonical-URL dedup in front of content dedup when `urlCol`
    * is set.
    */
  def frontDoor(docs: DataFrame, htmlInput: Boolean = false,
                urlCol: Option[String] = None, textCol: String = "text")
      : DataFrame = {
    val text0 =
      if (htmlInput)
        docs.withColumn(textCol, graft.llm.Html.extractText(col(textCol)))
      else docs
    urlCol match {
      case Some(u) =>
        text0.withColumn("_curl", graft.llm.Urls.canonicalize(col(u)))
      case None => text0
    }
  }

  /** Dedup + quality-annotate in one projection over the deduped stream.
    * Input columns: (`idCol`, `textCol`, source, ts). Output: (`idCol`,
    * source, ts, n_words, rules_failed, kept). With `htmlInput`, markup
    * strips BEFORE the content hash and the quality words; with `urlCol`,
    * a refetch of the same canonical URL drops FIRST through its own
    * watermark-GC'd 32-byte key state (append mode supports the chained
    * dedup-then-dedup shape), then content dedup catches the same text
    * under different URLs - the batch facade's stage 0b / stage 1 order.
    */
  def curate(docs: DataFrame, watermark: String = "10 minutes",
             textCol: String = "text", idCol: String = "doc_id",
             minWords: Int = 50, htmlInput: Boolean = false,
             urlCol: Option[String] = None,
             c4MinKeptLines: Option[Int] = None): DataFrame = {
    val fd0 = frontDoor(docs, htmlInput, urlCol, textCol)
    // optional stage 0c (the batch facade's order): the C4 line rules
    // REWRITE the text before any dedup state, so boilerplate-only
    // differences hash away — still a stateless projection
    val fd = c4MinKeptLines match {
      case Some(mk) =>
        val keep = Seq("source", "ts") ++ urlCol.map(_ => "_curl").toSeq
        graft.llm.TextStats.c4Filter(fd0, textCol, idCol,
            minKeptLines = mk, keepCols = keep)
          .where(col("kept_doc"))
          .withColumnRenamed("clean_text", textCol)
          .drop("n_lines", "n_kept", "kept_doc")
      case None => fd0
    }
    val deduped = urlCol match {
      case Some(_) =>
        // Null/blank URLs bypass the URL stage on a per-doc key: sha2(null)
        // is null and dropDuplicatesWithinWatermark pools null keys, so
        // every URL-less doc in the watermark window would otherwise
        // collapse to one row. Content dedup below still judges them.
        val keyed = fd.withColumn("_curl",
          coalesce(nullif(col("_curl"), lit("")),
            concat(lit("\u0000id:"), col(idCol).cast("string"))))
        // the chain defines the watermark ONCE (redefining it downstream
        // of a stateful operator is disallowed); the content stage rides
        // the URL stage's watermark
        StreamDedup.exact(keyed, "_curl", "ts", watermark)
          .drop("_curl", "content_hash")
          .withColumn("content_hash", sha2(col(textCol), 256))
          .dropDuplicatesWithinWatermark("content_hash")
      case None => StreamDedup.exact(fd, textCol, "ts", watermark)
    }
    graft.llm.TextStats.gopherFilter(deduped,
      textCol, idCol, minWords, keepCols = Seq("source", "ts"))
  }

  /** NEAR-dup-aware streaming curation: each micro-batch ingests into the
    * persistent [[graft.llm.SignatureStore]] (near-dups resolve against
    * ALL history via stored signatures — exact copies included, identical
    * signatures band identically), drops the duplicates, applies the
    * gopher quality rules, and lands the curated batch in
    * `<outPath>/b<batchId>` (overwrite — idempotent under recovery, the
    * store's own exactly-once scheme). This is the stage [[curate]]
    * cannot be: in-stream LSH filtering needs a per-doc fold across band
    * groups, which chained stateful operators disallow — the store-backed
    * foreachBatch shape is the sanctioned form, with
    * [[StreamDedupNear.matches]] as its low-latency in-stream match feed
    * twin (horizon-bounded state, no store).
    */
  def curateNearStream(outPath: String, storePath: String, docs: DataFrame,
                       textCol: String = "text", idCol: String = "doc_id",
                       minWords: Int = 50,
                       cfg: graft.llm.SignatureStore.Config =
                         graft.llm.SignatureStore.Config())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batch = df.toDF()
        val verdicts = graft.llm.SignatureStore.ingest(batch.sparkSession,
          storePath, batch, textCol, idCol, cfg, batchId = Some(id))
        val kept = batch.join(
          verdicts.where(!col("is_dup")).select(col("id").as(idCol)), idCol)
        graft.llm.TextStats.gopherFilter(kept, textCol, idCol, minWords,
            keepCols = Seq("source", "ts"))
          .where(col("kept") === 1)
          .write.mode("overwrite").parquet(outPath + "/b" + id)
        ()
      }

  /** STREAMING content-defined-chunking ledger — the CDC stage's stream
    * twin ([[graft.llm.Cdc.dedupStats]] is the batch story): every
    * micro-batch chunks its docs at content-defined boundaries, accounts
    * duplicated bytes against ALL history through the persistent chunk-key
    * store (O(batch) — history text is never rescanned), and lands its
    * per-doc ledger in `<outPath>/b<batchId>`. Recovery is exactly-once by
    * construction: the batch's own store subdirectory is excluded from the
    * history it probes and overwritten on replay
    * ([[graft.llm.Cdc.ingestBatch]]), and the ledger write is an
    * idempotent per-batch overwrite — kill and restart anywhere and every
    * sink converges to the sequential run.
    */
  def cdcLedgerStream(outPath: String, storePath: String, docs: DataFrame,
                      textCol: String = "text", idCol: String = "doc_id",
                      w: Int = 8, divisor: Long = 64L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batch = df.toDF()
        val led = graft.llm.Cdc.ingestBatch(batch.sparkSession, storePath,
          batch, id, textCol, idCol, w, divisor)
        led.write.mode("overwrite").parquet(outPath + "/b" + id)
        ()
      }

  /** Sources flooding junk: heavy hitters over the DROPPED docs' source
    * ids — the per-key counter emits at `threshold` then every `every`,
    * so a misbehaving crawl domain surfaces while the stream runs, with
    * output volume independent of the event rate.
    */
  def junkSources(curated: DataFrame, threshold: Long = 3L,
                  every: Long = 2L): Dataset[HeavyHit] =
    StreamHeavyHitters.hits(
      curated.where(col("kept") === 0)
        .select(col("source").cast("string")).as[String](Encoders.STRING),
      threshold, every)

  /** Windowed drop-alert feed: per-(source, rule-family) counts over
    * tumbling event-time windows, append-emitted on window close — the
    * [[DqAlerts]] shape with the gopher verdict as the violation type.
    */
  def dropAlerts(curated: DataFrame, windowLen: String = "1 minute"): DataFrame =
    // no second withWatermark: the curated stream already carries the
    // dedup stage's watermark on ts (redefining one is disallowed when
    // stateful operators chain)
    DqAlerts.alertCounts(
      curated.where(col("kept") === 0)
        .select(col("ts"), col("source").as("loc"),
          concat(lit("gopher_rules_"), col("rules_failed")).as("type")),
      windowLen, watermark = None)
}
