package graft.llm

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly operators for training-data pipelines: deterministic
  * sampling, weighted source mixing, and sequence packing.
  *
  * Sampling and mixing are HASH-based, not RNG-based: `rand()`-style
  * sampling re-draws on every retry/re-run, which silently changes the
  * corpus between attempts — the classic reproducibility bug in training
  * pipelines. A hash of the stable id is reproducible across runs, engines,
  * and partitionings, and composes (the 10% sample of the 50% mix is always
  * the same documents).
  */
object Corpus {

  /** The affine constants behind [[hashUnit]] — shared with oracle SQL. */
  def hashConstants(seed: Long): (Long, Long) = (
    Math.floorMod(PolyHash.splitmix(seed * 1000003L), PolyHash.P1 - 1) + 1,
    Math.floorMod(PolyHash.splitmix(seed * 1000003L + 1), PolyHash.P1))

  /** 2^32 and the xorshift-multiply constant of [[mix32]] — shared with the
    * oracle SQL replay.
    */
  val M32 = 4294967296L
  val MixK = 0x45d9f3bL // 73244475

  /** Nonlinear 32-bit mixing rounds (xorshift + multiply, the lowbias32
    * construction): every operation is exact BIGINT arithmetic in ANY engine
    * — products stay < 2^59, reductions are mod 2^32 — so the mix is
    * bit-reproducible cross-engine with no 64-bit overflow semantics in
    * play.
    */
  def mix32(id: Column): Column = {
    val x0 = id % M32
    val x1 = (x0.bitwiseXOR(shiftrightunsigned(x0, 16)) * MixK) % M32
    val x2 = (x1.bitwiseXOR(shiftrightunsigned(x1, 16)) * MixK) % M32
    x2.bitwiseXOR(shiftrightunsigned(x2, 16))
  }

  /** JVM twin of the columnar [[mix32]] — identical arithmetic on a
    * nonnegative long, for native expressions that need the scatter
    * row-locally (e.g. the random-sign projection).
    */
  def mix32L(x: Long): Long = {
    val x0 = x % M32
    val x1 = ((x0 ^ (x0 >>> 16)) * MixK) % M32
    val x2 = ((x1 ^ (x1 >>> 16)) * MixK) % M32
    x2 ^ (x2 >>> 16)
  }

  /** Uniform in [0,1) per id: a [[mix32]] round then an affine draw with
    * seed-derived constants — engine-agnostic modular arithmetic
    * throughout. The mixing round matters for the common sequential-id
    * case: a bare affine map sends consecutive ids to an arithmetic
    * progression mod P1 (a fixed stride in [0,1), NOT a uniform scatter);
    * after mixing, consecutive ids draw independently for every practical
    * purpose, while determinism and composability are unchanged.
    */
  def hashUnit(id: Column, seed: Long): Column = {
    val (a, b) = hashConstants(seed)
    ((lit(a) * (mix32(id) % PolyHash.P1) + b) % PolyHash.P1).cast("double") / PolyHash.P1
  }

  /** Deterministic `rate`-fraction sample keyed on `idCol`. */
  def sampleHash(df: DataFrame, rate: Double, idCol: String = "doc_id",
                 seed: Long = 42L): DataFrame =
    df.where(hashUnit(col(idCol), seed) < rate)

  /** Deterministic corpus split (train/valid/test): the id's [[hashUnit]]
    * draw against cumulative fraction thresholds. Pure projection — the
    * split label is a function of the id ALONE, which is what makes the
    * split safe at pipeline scale: reproducible across runs, engines and
    * partitionings; stable under corpus growth (a new crawl never moves an
    * existing doc between splits, so eval sets cannot silently leak into
    * train); composable with the samplers (a downstream sampleHash on a
    * different seed is independent of the split draw). Zero shuffle.
    */
  def splitAssign(df: DataFrame, fractions: Seq[(String, Double)],
                  idCol: String = "doc_id", seed: Long = 42L,
                  outCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1: $fractions")
    val u = hashUnit(col(idCol), seed)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // The last split takes the remainder — no float-boundary row can fall
    // through (u < 1.0 is not guaranteed to catch u vs a summed 1.0).
    val label = fractions.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((name, hi), acc) =>
        when(u < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(outCol, label)
  }

  /** Weighted source mix: keep each row with its source's rate (sources
    * absent from `rates` are dropped) — the downsampling step that turns raw
    * source volumes into a training mix. Pure filter: no shuffle, and the
    * decision for a document never changes across runs.
    */
  def mixWeighted(df: DataFrame, rates: Map[String, Double],
                  sourceCol: String = "source", idCol: String = "doc_id",
                  seed: Long = 42L): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.where(hashUnit(col(idCol), seed) < rate)
  }

  /** Temperature-scaled mixing rates — the standard multilingual/multi-
    * source sampling recipe (p_s ∝ n_s^τ, Conneau et al. 2020 "Unsupervised
    * Cross-lingual Representation Learning at Scale", public): τ = 1
    * preserves natural proportions, τ → 0 flattens toward uniform, and the
    * per-source keep rate is scaled so the EXPECTED sampled volume hits
    * `budget` tokens (capped at 1 — a source cannot be over-sampled).
    * Output `(groupCol, n_tokens, rate)` feeds [[mixWeighted]].
    *
    * Scale shape: one keyed aggregate (map-side combined) produces the
    * per-source relation; the normalizing sum runs in a window over THAT
    * relation — bounded by source cardinality, never corpus size — ordered
    * by the group value so the float total is deterministic and
    * engine-identical. The rate is rounded once at the edge (6 dp,
    * binary-value) to absorb pow()'s cross-libm ulp.
    *
    * DOCUMENTED BOUNDARY RISK: unlike the integer-exponent paths (which
    * avoid pow() entirely — NgramLm.alphaPow), a non-integer τ has no
    * finite-product construction, so both engines make one libm
    * `pow(n_s, τ)` call on identical inputs and the 6-dp edge round absorbs
    * the ≤1-ulp disagreement — EXCEPT when the true value lies within an
    * ulp of a 6-dp rounding boundary. That residual is ~1e-10 per source
    * row, and the relation has source-cardinality rows (config-bounded),
    * not corpus rows; accepted and pinned by the `corpus_mix_rates` oracle
    * rather than worked around.
    */
  def mixRates(df: DataFrame, tokens: Column, budget: Long,
               groupCol: String = "source",
               temperature: Double = 0.7): DataFrame = {
    require(temperature >= 0.0, s"temperature must be >= 0, got $temperature")
    val ps = df.groupBy(groupCol).agg(sum(tokens.cast("long")).as("n_tokens"))
    val win = Window.orderBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ps.withColumn("_w", pow(col("n_tokens").cast("double"), lit(temperature)))
      .withColumn("_tot", sum("_w").over(win))
      .select(col(groupCol), col("n_tokens"),
        graft.functions.Rounding.dround(
          least(lit(1.0),
            lit(budget.toDouble) * col("_w") / (col("_tot") * col("n_tokens"))),
          6).as("rate"))
  }

  /** Per-row weighted sample: keep a row iff its hash draw falls below the
    * row's own keep probability (clamped to [0,1]) — quality-proportional
    * downsampling, the "keep good documents more often" gate of a curation
    * pipeline. Same reproducibility contract as [[sampleHash]]: a pure
    * filter, no shuffle, and the keep decision for a document never changes
    * across runs, engines, or partitionings — only the weight formula and
    * the seed define the corpus.
    */
  def sampleWeighted(df: DataFrame, weight: Column, idCol: String = "doc_id",
                     seed: Long = 42L): DataFrame =
    df.where(hashUnit(col(idCol), seed) <
      greatest(lit(0.0), least(lit(1.0), weight)))

  /** Global token-budget selection: take documents in (score DESC, id ASC)
    * order until the cumulative token count reaches `budget` — the
    * "best N tokens" corpus cut. Emits every row with its exact cumulative
    * predecessor mass and the keep verdict.
    *
    * The naive plan is a single global window (ORDER BY score DESC) — one
    * partition holding the corpus, dead at scale. This plan decomposes the
    * global cumulative sum by EXACT SCORE VALUE: per-score token totals
    * (keyed shuffle, map-side combined), a prefix sum over the tiny
    * score-distinct relation (bounded by score granularity — a config
    * property, e.g. ≤10⁴ values for a 4-dp score — never by corpus size),
    * broadcast back, and a within-score keyed window. No stage ever holds
    * more than one score-bucket of one shard in memory, so the selection
    * scales exactly like any other keyed aggregation.
    */
  def selectBudget(df: DataFrame, budget: Long, score: Column,
                   tokens: Column, idCol: String = "doc_id",
                   scoreScale: Int = 4): DataFrame = {
    // The boundedness of the score-distinct relation is what this plan's
    // scale story rests on, so it is ENFORCED, not assumed: the score is
    // rounded to `scoreScale` decimal places (binary-value rounding,
    // engine-portable — [[graft.functions.Rounding.dround]]) before
    // bucketing, capping the prefix-sum relation at ~2·10^scoreScale rows
    // even for a continuous caller-supplied score. Selection order becomes
    // (rounded score DESC, id ASC); a score already at ≤`scoreScale` dp
    // (e.g. [[TextStats.qualityScore]]'s 4) is unchanged.
    require(scoreScale >= 0 && scoreScale <= 9,
      s"scoreScale must be in [0, 9], got $scoreScale")
    val base = df.select(col(idCol),
      graft.functions.Rounding.dround(score.cast("double"), scoreScale)
        .as("score"),
      tokens.cast("long").as("n_tok"))
    // Prefix mass of strictly-higher scores: window over the score-distinct
    // relation (bounded by score granularity, not data).
    val perScore = base.groupBy("score").agg(sum("n_tok").as("bucket_tok"))
    val wScore = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perScore.select(col("score"),
      coalesce(sum("bucket_tok").over(wScore), lit(0L)).as("offset"))
    // Within-score cumulative mass: keyed window, partition = one score.
    val wIn = Window.partitionBy("score").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "score")
      .withColumn("cum_before",
        col("offset") + coalesce(sum("n_tok").over(wIn), lit(0L)))
      .select(col(idCol), col("score"), col("n_tok"), col("cum_before"),
        (col("cum_before") < budget).as("keep"))
  }

  /** Per-registrable-domain quota — the crawl-diversity cap every corpus
    * curation runs (a handful of mega-sites must not dominate the
    * training mix): rank each site's docs by `score` (ties to the lower
    * id) and keep the best `quota`. The site key is
    * [[Urls.registrableDomain]]; docs whose URL has no parseable host
    * BYPASS the cap on a per-doc sentinel key (the null-URL lesson:
    * pooling them under one NULL key would silently cap all URL-less
    * docs at `quota` globally). Returns the kept rows as
    * `(idCol, domain, rank)` with `domain` NULL for bypassed docs.
    *
    * Scale: the `row_number ≤ quota` filter on the raw rank attribute
    * plans as WindowGroupLimit — each map task keeps its local top-quota
    * per domain BEFORE the exchange, so even a mega-domain ships
    * O(quota × tasks) rows, never its full doc set.
    */
  def domainQuota(df: DataFrame, quota: Int, score: Column,
                  urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val dom = Urls.registrableDomain(col(urlCol))
    val w = Window.partitionBy("_dom").orderBy(col("_s").desc, col(idCol))
    df.select(col(idCol), dom.as("domain"), score.as("_s"))
      .withColumn("_dom", coalesce(col("domain"),
        concat(lit("\u0000doc:"), col(idCol).cast("string"))))
      .withColumn("_rn", row_number().over(w)) // raw rank attr: group-limit
      .where(col("_rn") <= quota)
      .select(col(idCol), col("domain"), col("_rn").cast("long").as("rank"))
  }

  /** Deterministic fixed-size per-stratum sample: rank rows within each
    * stratum by their hash draw (ties by id) and keep the first `n` — the
    * balanced-subset step that caps every language/source at the same count
    * regardless of raw volume. The rank window is KEYED by the stratum
    * (never a global sort), and Spark plans the `row_number <= n` filter as
    * a WindowGroupLimit: each map task keeps only its local top-n per
    * stratum BEFORE the shuffle, so the exchange carries
    * O(strata × n × tasks) rows, not the corpus.
    */
  def sampleStratified(df: DataFrame, n: Int, strataCol: String = "lang",
                       idCol: String = "doc_id", seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(hashUnit(col(idCol), seed), col(idCol))
    df.withColumn("_r", row_number().over(w)).where(col("_r") <= n).drop("_r")
  }

  /** Pack documents into fixed token-budget bins (context windows) per
    * `groupCol`: greedy by cumulative token count in ([[mix32]]-shard,
    * `idCol`) order — `bin = floor(tokens_before_this_doc / budget)`, with
    * bin numbers globally consistent within each group.
    *
    * A single window keyed by `groupCol` alone is a scale trap: the dominant
    * language of a web corpus IS most of the corpus, so one task would sort
    * half of 100 TB. This plan is TWO-LEVEL, the same decomposition as
    * [[selectBudget]]: documents are scattered into `nShards` deterministic
    * hash shards, the within-(group, shard) prefix is a keyed window whose
    * partitions are corpus/nShards each, and per-shard token offsets — a
    * (groups × nShards)-row relation, bounded by config, never by data —
    * are prefix-summed and broadcast back. `offset + within-shard prefix`
    * equals the prefix in global (shard, id) order exactly, so binning is
    * identical to a single sort over that order without any task ever
    * holding more than one shard of one group. Bins may straddle a shard
    * boundary; the budget invariant (no doc starts once its bin's budget is
    * consumed) holds globally.
    *
    * A document longer than `budget` still lands in one bin (truncation/
    * splitting is the tokenizer's concern, not the packer's). The shard is
    * a pure function of the id, so packing is deterministic across runs,
    * engines, and partitionings.
    */
  /** Overlapping token-window chunking — the context-window splitter for
    * RAG / long-document pretraining prep: chunk c of a document covers
    * tokens [c·stride, c·stride + window), with 1 + ceil(max(n − window,
    * 0) / stride) chunks — one chunk for any document at or under the
    * window, and beyond that exactly as many stride steps as needed for
    * the last window to reach the final token (no redundant all-overlap
    * tail; stride < window gives the overlap).
    *
    * Output `(idCol, chunk_id, chunk_tokens, chunk_text)`. Pure per-row
    * explode — no shuffle, no state; chunk identity is (doc, ordinal), so
    * the split is deterministic under any partitioning and incremental
    * ingest. Scale: output rows ≈ corpus tokens / stride; each chunk
    * carries only its own text slice.
    */
  def chunkDocuments(df: DataFrame, window: Int, stride: Int,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    val nChunks = lit(1L) +
      ceil(greatest(size(col("_toks")) - window, lit(0)).cast("double") / stride)
        .cast("long")
    df.select(col(idCol), toks.as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("_toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("_w"))
      .select(col(idCol), col("chunk_id"),
        size(col("_w")).cast("long").as("chunk_tokens"),
        array_join(col("_w"), " ").as("chunk_text"))
  }

  /** Materialize the packed TRAINING SEQUENCES from [[packSequences]]'
    * bins: each (group, bin)'s documents concatenated in id order with
    * `sep` — the last step before tokenized examples ship to a trainer.
    * The per-bin collected list is bounded by the token budget (config),
    * and ordering comes from an `array_sort` over (id, text) structs —
    * deterministic under any partitioning, no window over the corpus.
    * Returns `(groupCol, bin, bin_tokens, seq_text)`.
    */
  def packConcat(df: DataFrame, budget: Int, sep: String = " <eos> ",
                 groupCol: String = "lang", textCol: String = "text",
                 idCol: String = "doc_id", tokens: Column = null,
                 nShards: Int = 64): DataFrame =
    packSequences(df, budget, groupCol, idCol, tokens, nShards)
      .join(df.select(col(idCol), col(textCol)), idCol)
      .groupBy(groupCol, "bin")
      .agg(sum("n_tok").as("bin_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            x => x.getField(textCol)),
          sep).as("seq_text"))

  def packSequences(df: DataFrame, budget: Int, groupCol: String = "lang",
                    idCol: String = "doc_id", tokens: Column = null,
                    nShards: Int = 64): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val tok = Option(tokens).getOrElse(TextStats.tokenCount(col("text")))
    val base = df.withColumn("n_tok", tok)
      .withColumn("_shard", pmod(mix32(col(idCol)), lit(nShards.toLong)))
    // Per-(group, shard) token totals → prefix over the shard-distinct
    // relation (≤ nShards rows per group partition — config-bounded).
    val perShard = base.groupBy(groupCol, "_shard")
      .agg(sum("n_tok").as("shard_tok"))
    val wShard = Window.partitionBy(groupCol).orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perShard.select(col(groupCol), col("_shard"),
      coalesce(sum("shard_tok").over(wShard), lit(0L)).as("_offset"))
    // Within-(group, shard) prefix: keyed window, partition = one shard of
    // one group — corpus/nShards rows even for a single-language corpus.
    val wIn = Window.partitionBy(groupCol, "_shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq(groupCol, "_shard"))
      .withColumn("bin",
        ((col("_offset") + coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
          / budget).cast("long"))
      .select(col(idCol), col(groupCol), col("bin"), col("n_tok"))
  }

  /** Crawl-over-crawl snapshot DIFF — the change accounting every
    * recurring-ingest pipeline logs before deciding what to reprocess:
    * per-doc status between a previous and a current snapshot, by id
    * presence and CONTENT hash:
    *
    *   - `added`     — id only in the current snapshot;
    *   - `removed`   — id only in the previous one;
    *   - `changed`   — id in both, content hash differs (a re-fetch that
    *     actually changed — the docs that need re-dedup/re-scoring);
    *   - `unchanged` — id in both, identical content (skip — the whole
    *     point of diffing before reprocessing).
    *
    * One full-outer keyed join on the id; content compares as sha2 hashes
    * (32 bytes per side), so document text never enters the exchange —
    * the [[Dedup.exact]] posture. Returns `(idCol, status)`; roll up with
    * a groupBy for the per-status counts a run log records.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    // presence keys on a NON-NULL marker, not on the hash: sha2(NULL) is
    // NULL, so a null-text doc would otherwise read as absent and
    // misclassify; content compares null-safely (null text <=> null text
    // is unchanged, null vs non-null is a change)
    def hashed(df: DataFrame, h: String, in: String) =
      df.select(col(idCol), sha2(col(textCol), 256).as(h), lit(true).as(in))
    hashed(prev, "_hp", "_inP")
      .join(hashed(cur, "_hc", "_inC"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_inP").isNull, lit("added"))
          .when(col("_inC").isNull, lit("removed"))
          .when(col("_hp") <=> col("_hc"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Per-document NOVELTY score — the fraction of a doc's distinct
    * `shingleLen`-gram shingles that FIRST appear in that doc (by
    * ascending id order over the corpus): the per-doc refinement of the
    * decile-level `vocab_growth` readout, and the per-doc contribution
    * signal a curation pipeline ranks crawl sources by (a mirror
    * re-fetch scores ~0, genuinely new material ~1).
    *
    * Scale shape — no corpus-sized join-back: the novel count per doc is
    * the group-size of `min(doc_id)` per shingle (ONE map-side-combined
    * shingle-keyed exchange, then a doc-keyed count over the
    * vocabulary-sized firsts relation), and the per-doc denominator is
    * doc-LOCAL (`size(array_distinct(...))` riding the same scan). The
    * final join is doc-cardinality ⋈ doc-cardinality.
    *
    * Returns `(idCol, n_shingles, n_novel, novelty)`; a token-less doc
    * has no shingles and scores 0.
    */
  def docNovelty(docs: DataFrame, shingleLen: Int = 5,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val sh = array_distinct(
      Dedup.shingles(TextStats.tokens(col(textCol)), shingleLen))
    val perDoc = docs.select(col(idCol),
      size(sh).cast("long").as("n_shingles"))
    val novel = docs
      .select(col(idCol).as("_d"), explode(sh).as("_sh"))
      .groupBy("_sh").agg(min("_d").as(idCol))
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        graft.functions.Rounding.dround(
          coalesce(col("n_novel"), lit(0L)) /
            when(col("n_shingles") > 0, col("n_shingles").cast("double"))
              .otherwise(lit(1.0)), 6).as("novelty"))
  }
}
