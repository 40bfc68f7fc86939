package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-call corpus curation pipeline — the composition a training-data
  * team actually runs, in the canonical order, as a single facade over the
  * library's stages:
  *
  *   0a. optional HTML → text extraction ([[Html.extractText]] — markup
  *      must be gone before any content stage reads the text);
  *   0b. optional canonical-URL dedup ([[Urls.canonicalize]], lowest id
  *      keeps) — the cheapest drop, no content compared;
  *   0c. optional C4 LINE filter ([[TextStats.c4Filter]] — structural
  *      line rules rewrite the text, too-few-surviving-lines docs drop;
  *      before exact dedup, so boilerplate-only differences hash away);
  *   1. EXACT dedup (content-hash, keep the lowest id);
  *   2. NEAR-dup cluster resolution via the persisted [[PairsIndex]]
  *      (built here if absent), keeping each cluster's HIGHEST-quality
  *      member (ties to the lower id);
  *   2b. optional exact-substring SPAN CUT ([[Dedup.removeDuplicatedSpans]]
  *      — rewrites text, drops nothing directly);
  *   3. the Gopher quality filter (doc-local rule bitmask);
  *   3b. optional BLOCKLIST gate ([[Blocklist.filter]], zero tolerance);
  *   4. optional benchmark DECONTAMINATION against an eval set
  *      (broadcast shingle probe);
  *   5. optional global token-BUDGET cut by quality (per-score-bucket
  *      cumsum — no global window).
  *
  * Returns the curated corpus plus a per-stage [[Curation.Report]] so the
  * yield of every stage is observable (the numbers a curation run logs).
  * Each stage is the library operator itself — same plans, same scale
  * posture; the facade adds ordering and accounting only.
  */
object Curation {

  final case class Report(nInput: Long, nAfterExact: Long,
      nAfterNearDup: Long, nAfterQuality: Long, nAfterDecontam: Long,
      nFinal: Long, nSpanTokensCut: Long = 0L,
      nAfterBlocklist: Long = -1L, nAfterUrl: Long = -1L,
      nAfterLines: Long = -1L) {
    override def toString: String =
      s"input=$nInput url=$nAfterUrl lines=$nAfterLines " +
        s"exact=$nAfterExact nearDup=$nAfterNearDup " +
        s"spanTokensCut=$nSpanTokensCut quality=$nAfterQuality " +
        s"blocklist=$nAfterBlocklist decontam=$nAfterDecontam final=$nFinal"
  }

  def run(docs: DataFrame, pairsPath: String,
          evalSet: Option[DataFrame] = None,
          tokenBudget: Option[Long] = None,
          textCol: String = "text", idCol: String = "doc_id",
          minWords: Int = 50, k: Int = 40,
          spanDedupK: Option[Int] = None,
          blocklist: Seq[String] = Nil,
          htmlInput: Boolean = false,
          urlCol: Option[String] = None,
          c4MinKeptLines: Option[Int] = None): (DataFrame, Report) = {
    val spark = docs.sparkSession
    val nInput = docs.count()

    // 0a. markup strip (crawl front door): every content stage below —
    //     quality words, shingles, span cuts — assumes markup is gone,
    //     so extraction rewrites textCol FIRST.
    val text0 =
      if (htmlInput) docs.withColumn(textCol, Html.extractText(col(textCol)))
      else docs

    // 0b. URL-level dedup: same canonical URL = the same page fetched
    //     twice — the cheapest drop in the pipeline (no content compared),
    //     so it runs before any text stage. Lowest id keeps. Docs with a
    //     null or blank URL BYPASS this stage (each keys on its own id —
    //     a window would otherwise pool every URL-less doc into one
    //     partition and keep only the lowest id); content dedup below is
    //     the stage that judges them.
    val (afterUrl, nUrl) = urlCol match {
      case Some(u) =>
        val curl = coalesce(nullif(Urls.canonicalize(col(u)), lit("")),
          concat(lit("\u0000doc:"), col(idCol).cast("string")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_curl")).orderBy(col(idCol))
        val kept = text0.withColumn("_curl", curl)
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_curl", "_rn")
        (kept, kept.count())
      case None => (text0, -1L)
    }

    // 0c. optional C4 LINE filter: the structural line rules REWRITE the
    //     text (boilerplate/code lines cut) and drop docs with too few
    //     surviving lines. Runs BEFORE exact dedup so that docs
    //     differing only in boilerplate lines hash identically below
    //     (the C4/RefinedWeb ordering).
    val (afterLines, nLines) = c4MinKeptLines match {
      case Some(mk) =>
        val f = TextStats.c4Filter(afterUrl, textCol, idCol,
            minKeptLines = mk)
          .where(col("kept_doc"))
          .select(col(idCol), col("clean_text").as(textCol))
        val kept = afterUrl.drop(textCol).join(f, idCol)
        (kept, kept.count())
      case None => (afterUrl, -1L)
    }

    // 1. exact: keep each content hash's lowest id
    val keepIds = Dedup.exact(afterLines, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val afterExact = afterLines.join(keepIds, idCol)

    // 2. near-dup: resolve components once (persisted artifact), keep the
    //    highest-quality member of each cluster. An existing layout at
    //    `pairsPath` is REUSED only when its corpus FINGERPRINT (count +
    //    content-hash XOR) matches the deduped corpus being curated — a
    //    stale index (corpus grew, shrank, or had docs re-fetched with
    //    changed text since the build) would silently skip near-dup
    //    resolution for the content it has never seen, so mismatch or a
    //    pre-fingerprint layout rebuilds instead. The fingerprint job
    //    doubles as the nExact count (one pass, not two).
    val corpusFp = PairsIndex.corpusFingerprintOf(afterExact, textCol, idCol)
    val nExact = corpusFp._1
    val idx = PairsIndex.loadIfPresent(spark, pairsPath)
      .filter(_ => PairsIndex.fingerprint(spark, pairsPath).contains(corpusFp))
      .getOrElse(PairsIndex.build(afterExact, pairsPath, textCol = textCol,
        idCol = idCol))
    val cc = idx.components(spark)
    val quality = afterExact.select(col(idCol).as("id"),
      TextStats.qualityScore(col(textCol)).as("_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col("_q").desc, col("id").asc)
    val dropIds = cc.join(quality, "id")
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") > 1)
      .select(col("id").as(idCol))
    val afterNearDup = afterExact.join(dropIds, Seq(idCol), "left_anti")
      .localCheckpoint(false) // three downstream stages reuse this relation
    val nNearDup = afterNearDup.count()

    // 2b. optional exact-substring span CUT (Lee et al. form): rewrite
    //     each doc with its non-canonical duplicated k-token spans
    //     removed — an EDIT, not a drop (a fully-cut doc falls to the
    //     quality stage's word floor). Runs after doc-level dedup so
    //     only genuinely partial overlaps reach the window kernel.
    val (afterSpans, nSpanCut) = spanDedupK match {
      case Some(kk) =>
        val cleaned = Dedup.removeDuplicatedSpans(afterNearDup, textCol,
            idCol, kk)
          .localCheckpoint(false) // feeds the rewrite AND the cut count
        val rewritten = afterNearDup.drop(textCol)
          .join(cleaned.select(col(idCol),
            col("clean_text").as(textCol), col("n_removed")), idCol)
        val cut = cleaned.agg(coalesce(sum("n_removed"), lit(0L)))
          .collect().head.getLong(0)
        (rewritten.drop("n_removed"), cut)
      case None => (afterNearDup, 0L)
    }

    // 3. quality rules
    val afterQuality = qualityStage(afterSpans, textCol, idCol, minWords)
    val nQuality = afterQuality.count()

    // 3b. optional blocklist gate (zero-tolerance Aho-Corasick match)
    val afterBlocklist =
      if (blocklist.isEmpty) afterQuality
      else afterQuality.join(
        Blocklist.filter(afterQuality, blocklist, textCol, idCol)
          .where(col("kept")).select(col(idCol)), idCol)
    val nBlocklist = if (blocklist.isEmpty) nQuality else afterBlocklist.count()

    // 4. decontamination (optional)
    val afterDecontam = decontamStage(afterBlocklist, evalSet, textCol, idCol)
    val nDecontam = afterDecontam.count()

    // 5. token budget (optional): best docs by quality until spent
    val finalDf = tokenBudget match {
      case Some(b) =>
        val sel = Corpus.selectBudget(afterDecontam, b,
            score = TextStats.qualityScore(col(textCol)),
            tokens = TextStats.tokenCount(col(textCol)), idCol = idCol)
          .where(col("keep")).select(col(idCol))
        afterDecontam.join(sel, idCol)
      case None => afterDecontam
    }
    val nFinal = finalDf.count()

    (finalDf,
      Report(nInput, nExact, nNearDup, nQuality, nDecontam, nFinal,
        nSpanCut, nBlocklist, nUrl, nLines))
  }

  /** The Gopher-keep stage shared by [[run]] and [[runIncremental]] (one
    * definition, so the facades cannot drift).
    */
  private def qualityStage(docs: DataFrame, textCol: String, idCol: String,
                           minWords: Int): DataFrame = {
    val kept = TextStats.gopherFilter(docs, textCol, idCol,
        minWords = minWords)
      .where(col("kept") === 1).select(col(idCol))
    docs.join(kept, idCol)
  }

  /** The optional decontamination stage shared by both facades. */
  private def decontamStage(docs: DataFrame, evalSet: Option[DataFrame],
                            textCol: String, idCol: String): DataFrame =
    evalSet match {
      case Some(ev) =>
        val flagged = Dedup.decontaminate(docs, ev, textCol, idCol)
          .select(col("id").as(idCol))
        docs.join(flagged, Seq(idCol), "left_anti")
      case None => docs
    }

  /** Per-stage yields of one INCREMENTAL curation batch. */
  final case class IncReport(nInput: Long, nAfterDedup: Long,
      nAfterQuality: Long, nFinal: Long) {
    override def toString: String =
      s"input=$nInput dedup=$nAfterDedup quality=$nAfterQuality final=$nFinal"
  }

  /** The INCREMENTAL twin of [[run]] — what a daily-crawl pipeline
    * actually executes per batch, O(batch) against all history:
    *
    *   1. exact + near dedup via ONE [[SignatureStore.ingest]] (identical
    *      texts have identical signatures, so the store resolves both;
    *      matches run against stored history signatures — the corpus text
    *      is never rescanned, and the batch enters the store so FUTURE
    *      batches resolve against it);
    *   2. the Gopher quality rules (doc-local);
    *   3. optional benchmark decontamination (broadcast shingle probe).
    *
    * Returns the curated batch + an [[IncReport]]. The streaming shape of
    * the same composition is [[graft.stream.StreamPipeline.curateNearStream]];
    * this is its batch form for orchestrated (one-job-per-crawl)
    * pipelines. Batch-local semantics match the store's documented
    * per-pair (not per-chain) recall contract.
    */
  def runIncremental(batch: DataFrame, storePath: String,
                     evalSet: Option[DataFrame] = None,
                     textCol: String = "text", idCol: String = "doc_id",
                     minWords: Int = 50,
                     cfg: SignatureStore.Config = SignatureStore.Config(),
                     batchId: Option[Long] = None)
      : (DataFrame, IncReport) = {
    val spark = batch.sparkSession
    val nInput = batch.count()
    // batchId forwards to the store's idempotent-replay contract: an
    // orchestrator retrying a crashed crawl job with the SAME id
    // overwrites its own per-batch store writes instead of appending the
    // batch's signatures twice
    val verdicts = SignatureStore.ingest(spark, storePath, batch,
      textCol, idCol, cfg, batchId = batchId)
    val kept = batch.join(
      verdicts.where(!col("is_dup")).select(col("id").as(idCol)), idCol)
    val nDedup = kept.count()
    val afterQuality = qualityStage(kept, textCol, idCol, minWords)
    val nQuality = afterQuality.count()
    val finalDf = decontamStage(afterQuality, evalSet, textCol, idCol)
    val nFinal = finalDf.count()
    (finalDf, IncReport(nInput, nDedup, nQuality, nFinal))
  }
}
