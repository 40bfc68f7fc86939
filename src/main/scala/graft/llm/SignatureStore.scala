package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature store for INCREMENTAL corpus dedup.
  *
  * A 100 TB corpus is not deduplicated in one shot — it grows crawl by
  * crawl. Re-running LSH over the full corpus per increment is O(corpus)
  * every time; the store makes each increment O(batch): it persists, for
  * every ingested document, its banded LSH bucket keys and its minhash
  * signature — NEVER the text — so a new batch equi-joins its own
  * (band, bucket) keys against the store's, estimates Jaccard from stored
  * signatures (integer agreement / k, float-exact), and only batch-sized
  * and match-sized state ever moves. Store growth is
  * O(docs × (bands + k)) longs, ~1e-4 of corpus bytes.
  *
  * Ingest semantics (mirroring batch-local LSH dedup à la SlimPajama):
  *
  *  1. intra-batch: signature-estimate pairs ≥ `threshold` within the batch
  *     → connected components → each component's minimum id is its keeper;
  *  2. store match: batch docs whose estimate vs ANY stored doc ≥
  *     `threshold` resolve to the matched doc's CANONICAL keeper; a whole
  *     intra-batch component resolves to the minimum canonical any member
  *     matched (deterministic: min over matches, then component fallback);
  *  3. append: ALL batch docs enter the store — kept ones as their own
  *     canonical, dropped ones mapped to their keeper — so a future
  *     near-copy of a DROPPED doc still resolves to the original keeper.
  *
  * The known gap vs a global one-shot pass is transitive chains split
  * across batches (X–W in batch 2, W–Y in batch 1, X matching no stored
  * doc directly): batch-local dedup accepts per-pair rather than per-chain
  * recall — on chain-free data the kept set equals the global droplist
  * (pinned by spec).
  */
object SignatureStore {

  /** `threshold` applies to the SIGNATURE-AGREEMENT estimate (E[est] = J),
    * the same pre-verify statistic as [[Dedup.minhashEstimate]].
    *
    * `maxBucket` is the hot-bucket guard: a boilerplate-heavy corpus can
    * put corpus-proportional occupancy behind ONE (band, bucket) key, and
    * the probe join would go quadratic there (the ngram/simhash failure
    * mode, see SCALE.md). Buckets whose STORE occupancy exceeds
    * `maxBucket` leave the LSH candidate path and match by full-signature
    * equality instead (`skey`): exact near-copies — the only thing that
    * fills a bucket to millions — still resolve, while a non-identical
    * near-dup is found through its remaining cold bands. Occupancy comes
    * from the pre-aggregated counts relation (one row per bucket per
    * ingest), not from scanning the store.
    */
  final case class Config(shingleLen: Int = 5, bands: Int = 8,
                          rowsPerBand: Int = 2, threshold: Double = 0.5,
                          maxBucket: Long = 100000L) {
    def numHashes: Int = bands * rowsPerBand
  }

  // batch-mode store rows are tagged BatchModeTag; NoBatch is the
  // "exclude nothing" sentinel (streaming batch ids are ≥ 0, so the two
  // can never collide with a real id or each other)
  private val BatchModeTag = -1L
  private val NoBatch = -2L

  private def sigsDir(path: String) = path + "/sigs"
  private def bucketsDir(path: String) = path + "/buckets"
  private def countsDir(path: String) = path + "/counts"

  /** Fraction of agreeing signature positions — bit-identical to
    * [[Dedup.minhashEstimate]]'s statistic.
    */
  private def estimate(a: Column, b: Column, k: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x) / lit(k.toDouble)

  /** A store "exists" only once ALL THREE relations do. Ingest writes
    * sigs → buckets → counts in that order, so the counts directory doubles
    * as a commit marker: a first streaming batch that crashes mid-write
    * leaves exists() = false and its replay rebuilds against the empty
    * store (overwriting its own partial subdirs) instead of wedging on a
    * PATH_NOT_FOUND for the unwritten relations. Crashes in LATER batches
    * are covered by `_b` masking in [[matches]].
    */
  private def exists(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(sigsDir(path), bucketsDir(path), countsDir(path)).forall { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).exists(p)
    }
  }

  /** Stored `(id, sig, canonical)` rows. (`recursiveFileLookup`: streaming
    * ingests write per-batch subdirectories for idempotent replay.)
    */
  def sigs(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(sigsDir(path))

  /** Stored `(id, band, bucket, skey)` rows (`skey` = hash of the full
    * signature, the hot-bucket match key).
    */
  def buckets(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(bucketsDir(path))

  /** Per-ingest pre-aggregated `(band, bucket, n)` occupancy rows. */
  def bucketCounts(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(countsDir(path))

  /** `(band, bucket, skey)`-keyed batch relation shared by the probe and
    * the append.
    */
  private def bandedKeyed(sig: DataFrame, cfg: Config): DataFrame =
    Dedup.bandedOf(sig, cfg.bands, cfg.rowsPerBand)
      .join(sig.select(col("id"), hash(col("sig")).as("skey")), "id")

  /** Build a fresh store at `path` (deleting any existing one) from the
    * first batch. Equivalent to ingest-into-empty.
    */
  def build(spark: SparkSession, path: String, docs: DataFrame,
            textCol: String = "text", idCol: String = "doc_id",
            cfg: Config = Config()): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    ingest(spark, path, docs, textCol, idCol, cfg)
  }

  /** Read-only store probe: batch docs matching ≥ 1 stored doc, as
    * `(id, keep_id, n_matches)` with `keep_id` = minimum canonical among
    * matches and `n_matches` = distinct stored docs matched. The batch
    * side computes signatures once; the store side is two keyed equi-joins
    * (buckets for candidates, sigs for the estimate) — the historical
    * corpus text is never read because it is not even stored.
    */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
            textCol: String = "text", idCol: String = "doc_id",
            cfg: Config = Config()): DataFrame = {
    val sig = Dedup.signatureOf(batch, textCol, idCol, cfg.shingleLen, cfg.numHashes)
    // an absent or half-written (uncommitted) store holds nothing to match
    if (!exists(spark, path))
      sig.limit(0).select(col("id").as(idCol),
        lit(null).cast("bigint").as("keep_id"),
        lit(null).cast("bigint").as("n_matches"))
    else
      matches(spark, path, sig, cfg)
        .groupBy(col("id").as(idCol))
        .agg(min("canonical").as("keep_id"),
          countDistinct("store_id").as("n_matches"))
  }

  /** `(id, store_id, canonical)` estimate-verified matches of a batch
    * signature relation against the store.
    */
  private def matches(spark: SparkSession, path: String, batchSig: DataFrame,
                      cfg: Config,
                      excludeBatch: Long = NoBatch): DataFrame = {
    // hot buckets from the pre-aggregated counts — ≤ storeRows/maxBucket
    // keys by construction, so the broadcast is bounded. `excludeBatch`
    // masks a streaming batch's own (possibly half-written) prior attempt
    // during replay, so a recovered batch never matches itself.
    val hot = bucketCounts(spark, path)
      .where(col("_b") =!= excludeBatch)
      .groupBy("band", "bucket").agg(sum("n").as("n"))
      .where(col("n") > cfg.maxBucket)
      .select("band", "bucket")
    val batchB = bandedKeyed(batchSig, cfg)
    val store = buckets(spark, path).where(col("_b") =!= excludeBatch)
    // cold path: normal LSH candidate equi-join, hot keys excluded on the
    // batch side (an excluded key produces nothing regardless of store side)
    val cold = batchB.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      .alias("a")
      .join(store.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id"), col("b.id").as("store_id"))
    // hot path: full-signature equality — the join key gains skey, so an
    // N-occupancy bucket fans out only to its exact near-copies
    val hotCand = batchB.join(broadcast(hot), Seq("band", "bucket"))
      .alias("a")
      .join(store.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.skey") === col("b.skey"))
      .select(col("a.id").as("id"), col("b.id").as("store_id"))
    val cand = cold.unionAll(hotCand).distinct()
    cand
      .join(batchSig.select(col("id"), col("sig").as("sig_a")), "id")
      .join(sigs(spark, path)
        .select(col("id").as("store_id"), col("sig").as("sig_b"), col("canonical")),
        "store_id")
      .where(estimate(col("sig_a"), col("sig_b"), cfg.numHashes) >= cfg.threshold)
      .select(col("id"), col("store_id"), col("canonical"))
  }

  /** Streaming ingest: each micro-batch runs the full batch [[ingest]]
    * through `foreachBatch`, with every store write going to a per-batch
    * subdirectory in OVERWRITE mode — a batch replayed after failure
    * rewrites its own subdir and is masked from matching its own prior
    * half-written attempt, so store contents are exactly-once under
    * Structured Streaming recovery. Verdicts land in
    * `<path>/verdicts/b<id>`. The caller starts the returned writer
    * (checkpointLocation, trigger, ...).
    */
  def ingestStream(path: String, stream: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id",
                   cfg: Config = Config())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val r = ingest(df.sparkSession, path, df.toDF(), textCol, idCol, cfg,
          batchId = Some(id))
        r.write.mode("overwrite").parquet(path + "/verdicts/b" + id)
        ()
      }

  /** Ingest a batch: returns `(id, canonical, is_dup)` for EVERY batch doc
    * (computed against the store as of entry — eagerly materialized before
    * the append so the batch never matches itself through the store), then
    * appends all batch signatures and bucket keys with their canonicals.
    */
  def ingest(spark: SparkSession, path: String, batch: DataFrame,
             textCol: String = "text", idCol: String = "doc_id",
             cfg: Config = Config(),
             batchId: Option[Long] = None): DataFrame = {
    val sig = Dedup.signatureOf(batch, textCol, idCol, cfg.shingleLen, cfg.numHashes)
      .persist()
    try {
      val banded = Dedup.bandedOf(sig, cfg.bands, cfg.rowsPerBand)

      // 1. intra-batch components over estimate-verified LSH pairs
      val intraPairs = banded.alias("a")
        .join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .distinct()
        .join(sig.select(col("id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(sig.select(col("id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .where(estimate(col("sig_a"), col("sig_b"), cfg.numHashes) >= cfg.threshold)
        .select("doc_a", "doc_b")
      val comp = Dedup.connectedComponents(intraPairs) // (id, component=min id)
      val withComp = sig.select(col("id"))
        .join(comp, Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("_comp"))

      // 2. store matches → component-level canonical (min matched canonical,
      //    else the component's own min id)
      val resolved =
        if (exists(spark, path)) {
          val m = matches(spark, path, sig, cfg,
            excludeBatch = batchId.getOrElse(NoBatch))
            .groupBy("id").agg(min("canonical").as("_sk"))
          withComp.join(m, Seq("id"), "left")
            .groupBy("_comp")
            .agg(min("_sk").as("_compSk"))
            .join(withComp, "_comp")
            .select(col("id"),
              coalesce(col("_compSk"), col("_comp")).as("canonical"))
        } else withComp.select(col("id"), col("_comp").as("canonical"))

      // eager, lineage-truncated: the verdicts must be FIXED before the
      // store mutates — a lazy plan would re-read the appended parquet on
      // recomputation and let the batch match itself
      val result = resolved
        .withColumn("is_dup", col("canonical") =!= col("id"))
        .localCheckpoint()

      // 3. append ALL batch docs (kept and dropped) so future near-copies
      //    of dropped docs still resolve to the original keeper; occupancy
      //    goes in pre-aggregated (one keyed combine over the batch only)
      def writeTo(df: DataFrame, dir: String): Unit = batchId match {
        // streaming micro-batches land in per-batch subdirectories in
        // OVERWRITE mode: a replayed batch rewrites its own subdir instead
        // of appending twice — idempotent store contents under recovery
        case Some(b) => df.write.mode("overwrite").parquet(dir + "/b" + b)
        case None    => df.write.mode("append").parquet(dir)
      }
      // write ORDER is load-bearing: counts goes LAST so it doubles as the
      // store's commit marker (see `exists`)
      val bTag = lit(batchId.getOrElse(BatchModeTag)).as("_b")
      writeTo(sig.join(result.select("id", "canonical"), "id")
        .select(col("id"), col("sig"), col("canonical"), bTag), sigsDir(path))
      writeTo(bandedKeyed(sig, cfg).withColumn("_b", bTag), bucketsDir(path))
      writeTo(banded.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .withColumn("_b", bTag), countsDir(path))
      result
    } finally { sig.unpersist(); () }
  }

  /** Offline compaction: closes the documented transitive-chain gap of
    * batch-local ingest. A in batch 1 and B in batch 2 with J(A,B) below
    * threshold stay separate keepers even if a LATER doc C matches both —
    * C resolves to min(keeper) but B's stored canonical is never revisited.
    * Compaction re-canonicalizes the WHOLE store in one pass:
    *
    *  1. candidate pairs from the STORED bucket keys (the banded LSH
    *     self-join ingest runs per batch, now across all batches; hot
    *     buckets from the aggregated counts fall back to full-signature
    *     `skey` equality, same trade as [[matches]]);
    *  2. estimate-verify against stored signatures (text is not stored, so
    *     this is the same float-exact statistic every path uses);
    *  3. union with the existing (id → canonical) resolution edges so
    *     dropped docs stay attached to their chains;
    *  4. connected components → every store row's canonical becomes its
    *     component's minimum id (= global first occurrence);
    *  5. rewrite sigs via a sibling directory + rename swap.
    *
    * Run it like any table-maintenance job: while NO ingest (batch or
    * streaming) is active. The rewrite flattens streaming per-batch
    * subdirectories of sigs/ (the `_b` column — which masking keys on — is
    * preserved), so a pre-compaction micro-batch must not replay afterwards;
    * stopping the stream at a checkpoint-committed boundary guarantees that.
    * Cost is O(store), not O(corpus): signatures and bucket keys are
    * ~1e-4 of corpus bytes, and the self-join is the same bounded
    * (band, bucket) equi-join every LSH path uses.
    */
  def compact(spark: SparkSession, path: String,
              cfg: Config = Config()): Unit = {
    if (!exists(spark, path)) return
    val s = sigs(spark, path).persist()
    try {
      val bk = buckets(spark, path)
      val hot = bucketCounts(spark, path)
        .groupBy("band", "bucket").agg(sum("n").as("n"))
        .where(col("n") > cfg.maxBucket)
        .select("band", "bucket")
      val cold = bk.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      val coldPairs = cold.alias("a")
        .join(cold.alias("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      val hotB = bk.join(broadcast(hot), Seq("band", "bucket"))
      val hotPairs = hotB.alias("a")
        .join(hotB.alias("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.skey") === col("b.skey") && col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      val verified = coldPairs.unionAll(hotPairs).distinct()
        .join(s.select(col("id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(s.select(col("id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .where(estimate(col("sig_a"), col("sig_b"), cfg.numHashes) >= cfg.threshold)
        .select("doc_a", "doc_b")
      val canonEdges = s.where(col("canonical") =!= col("id"))
        .select(col("id").as("doc_a"), col("canonical").as("doc_b"))
      val comp = Dedup.connectedComponents(verified.unionAll(canonEdges))
      val newSigs = s.join(comp, Seq("id"), "left")
        .select(col("id"), col("sig"),
          coalesce(col("component"), col("canonical")).as("canonical"),
          col("_b"))
      // the write job reads the OLD sigs dir while producing the sibling,
      // so the swap only happens after the new relation is fully on disk.
      // Three-step swap (same scheme as Etl.compactFiles): old aside → new
      // in → delete old. The canonical sigs/ dir is absent only between two
      // metadata renames, and a crash at any point leaves a complete copy
      // at sigs/ or sigs_precompact/ (recover() renames it back).
      val tmp = path + "/sigs_compacting"
      newSigs.write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val oldP = new org.apache.hadoop.fs.Path(path + "/sigs_precompact")
      fs.delete(oldP, true)
      // rename returns false (not an exception) for many HDFS failures; an
      // unchecked false would let the final delete drop the only copy.
      if (!fs.rename(new org.apache.hadoop.fs.Path(sigsDir(path)), oldP))
        throw new java.io.IOException(
          s"SignatureStore.compact: rename(sigs -> sigs_precompact) returned " +
            s"false under $path; store left untouched, new copy at $tmp")
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(sigsDir(path))))
        throw new java.io.IOException(
          s"SignatureStore.compact: rename(sigs_compacting -> sigs) returned " +
            s"false under $path; old copy preserved at sigs_precompact — run recover()")
      fs.delete(oldP, true)
      ()
    } finally { s.unpersist(); () }
  }

  /** Crash recovery for [[compact]]'s three-step swap: restores sigs/ from
    * the sigs_precompact/ aside copy if the swap died between its two
    * renames, and clears stale swap siblings otherwise. Call before opening
    * a store that may have crashed mid-compaction. Returns true if a
    * recovery action ran.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sigsP = new org.apache.hadoop.fs.Path(sigsDir(path))
    val oldP = new org.apache.hadoop.fs.Path(path + "/sigs_precompact")
    val tmpP = new org.apache.hadoop.fs.Path(path + "/sigs_compacting")
    val tmpComplete = fs.exists(tmpP) &&
      fs.exists(new org.apache.hadoop.fs.Path(tmpP, "_SUCCESS"))
    if (fs.exists(oldP) && !fs.exists(sigsP)) {
      if (!fs.rename(oldP, sigsP))
        throw new java.io.IOException(
          s"SignatureStore.recover: rename(sigs_precompact -> sigs) returned false under $path")
      fs.delete(tmpP, true); true
    } else if (!fs.exists(sigsP) && tmpComplete) {
      // sigs/ and the aside both gone; the committed compacted copy is the
      // ONLY copy of the store — promote it, never delete it.
      if (!fs.rename(tmpP, sigsP))
        throw new java.io.IOException(
          s"SignatureStore.recover: rename(sigs_compacting -> sigs) returned false under $path")
      true
    } else if (fs.exists(sigsP) && (fs.exists(oldP) || fs.exists(tmpP))) {
      fs.delete(oldP, true); fs.delete(tmpP, true); true
    } else false
  }
}
