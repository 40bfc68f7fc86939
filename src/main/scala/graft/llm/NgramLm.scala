package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the perplexity quality filter of the
  * CCNet recipe, built the way a 100 TB engine has to build it: the model
  * is a RELATION, not a broadcast. Smoothing is stupid backoff (Brants et
  * al. 2007, "Large Language Models in Machine Translation" — the scheme
  * DESIGNED for distributed n-gram counting: no discounting pass, one
  * count table, a constant backoff multiplier).
  *
  * Train = one explode + groupBy per order (keyed, map-side combined;
  * output is vocabulary-sized). Score = the document positions relation
  * left-joined against the model ON THE GRAM STRING — every join is a
  * keyed shuffle that scales like any other join; nothing assumes the
  * model fits in memory.
  *
  * Scoring semantics, pinned for cross-engine replay (`lm_score` oracle):
  *
  *  - tokens are non-empty whitespace tokens in document order; grams are
  *    space-joined token runs;
  *  - for position i (0-based), k_max = min(n, i+1); with c_k the count
  *    of the k-gram ending at i and ctx_k its (k−1)-gram context count:
  *    S_i = c_k / ctx_k for the LARGEST k ≤ k_max with c_k > 0 (ctx_1 =
  *    total token count N), multiplied by alpha^(k_max − k); an unseen
  *    unigram floors at alpha^(k_max − 1) / N;
  *  - per-token term = log10(S_i) rounded to micro-units with the
  *    sign-aware binary-value formula of
  *    [[graft.functions.Rounding.dround]], summed as exact BIGINTs
  *    (partition-invariant, the PSI pattern);
  *  - doc score = round(−Σ terms / (n_tok·1e6), 6) — mean negative log10
  *    probability per token (lower = more fluent under the model).
  */
object NgramLm {

  /** `(gram, k, cnt)` counts for all orders 1..n, plus the `("", 0, N)`
    * total-token row — ONE relation holding the whole model.
    *
    * All n orders ride ONE exploded array into ONE keyed aggregate (gram
    * strings of different orders can't collide — they differ in word
    * count, which is also how `k` is recovered after the aggregate: cheap
    * codegen'd space counting, the same trick as the scoring fold). The
    * `("", 0, N)` total rides the SAME explode as one empty-string marker
    * per token (grams are never empty, so no collision; map-side combine
    * collapses the markers to ~one row per task) — a union-leg total
    * would re-execute the corpus aggregate: identical exchanges in two
    * legs of one union are NOT reliably deduplicated at runtime (observed
    * racing as two concurrent map jobs under AQE). The per-order union
    * formulation scanned and shuffled the corpus once per order; this is
    * one scan + one corpus-keyed shuffle at any n (plan-asserted in
    * LlmSpec), plus a vocab-sized normalization aggregate that guarantees
    * the total row exists even for an empty corpus.
    */
  def train(df: DataFrame, textCol: String = "text", n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 5, s"order must be in [1, 5], got $n")
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    // gram extraction is the native WordGrams kernel (all occurrences, doc
    // order) — the interpreted HOF form was the dominant training cost
    val allOrders = (1 to n).map(k => graft.functions.native.wordGrams(toks, k))
    val withMarkers =
      concat((allOrders :+ array_repeat(lit(""), size(toks))): _*)
    val counts = df
      .select(explode(withMarkers).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .select(col("gram"),
        when(col("gram") === "", lit(0)).otherwise(
          (length(col("gram")) - length(translate(col("gram"), " ", "")) + 1)
            .cast("int")).as("k"),
        col("cnt"))
    // ensure ("", 0, N) exists even when the corpus has no tokens at all;
    // the re-aggregate runs over the VOCAB-sized relation, not the corpus
    val seed = df.sparkSession.range(1)
      .select(lit("").as("gram"), lit(0).as("k"), lit(0L).as("cnt"))
    counts.unionByName(seed)
      .groupBy("gram", "k").agg(sum("cnt").as("cnt"))
  }

  def save(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-document mean negative log10 probability under `model` —
    * `(idCol, n_tok, lm_score)`; documents with no tokens are dropped (no
    * distribution to score them under).
    */
  def score(df: DataFrame, model: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", n: Int = 2,
            alpha: Double = 0.4): DataFrame =
    score(df, prepare(model), textCol, idCol, n, alpha)

  /** [[score]] over an already-[[prepare]]d model — the repeated-scoring
    * path: the vocab-sized augmentation join and its metadata job run once
    * per model, not once per scoring invocation.
    */
  def score(df: DataFrame, model: PreparedModel, textCol: String,
            idCol: String, n: Int, alpha: Double): DataFrame =
    termMicroRelation(df, Seq(model), textCol, idCol, n, alpha)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum("_tm_0").as("_sum"))
      .select(col(idCol), col("n_tok"),
        graft.functions.Rounding.dround(
          -col("_sum").cast("double") / (col("n_tok") * 1e6), 6)
          .as("lm_score"))

  /** A model made score-ready ONCE, reusable across any number of scoring
    * invocations in the session (the augmented relation is a pure function
    * of the model artifact — the same offline-artifact class as the model
    * itself, so memoizing it beside the model is the natural boundary).
    * `aug` carries each gram's prefix-context count ([[prepare]]'s join
    * fusion), `sliceRows` the per-order row counts for the broadcast
    * decision, `totalN` the corpus token count.
    */
  final case class PreparedModel(aug: DataFrame, sliceRows: Map[Int, Long],
                                 totalN: Long) {
    /** The order-k slice, broadcast-hinted when its row count (known from
      * the metadata job — a checkpointed relation has no size statistics)
      * fits [[MaxBroadcastRows]].
      */
    def slice(k: Int): DataFrame = {
      val s = aug.where(col("k") === k)
      if (sliceRows.getOrElse(k, 0L) <= MaxBroadcastRows) broadcast(s) else s
    }
  }

  /** Build the score-ready form of a trained model.
    *
    * JOIN FUSION: the backoff denominator ctx_k of the k-gram ending at
    * position i is the count of tokens i−k+1..i−1 — exactly the
    * (k−1)-word PREFIX of that gram. So the context counts ride the
    * MODEL: one vocab-sized self-join attaches to every gram row the
    * count of its prefix, and scoring then needs n gram joins instead of
    * 2n−1 gram+context joins (the former dominant cost — each join is a
    * full pass over the corpus-sized position relation). The k=1 prefix
    * is substring_index(gram, ' ', 0) = "" which matches the ("", 0, N)
    * total row, so the unigram denominator N needs no special case.
    *
    * The model is persisted (not checkpointed) under the self-join: the
    * cache's per-block locking makes the two legs share ONE training
    * execution, and only the JOINED relation pays a LAZY localCheckpoint
    * — the checkpoint materializes inside the metadata collect below, so
    * training + augmentation + checkpoint + metadata are ONE Spark job
    * where an eager checkpoint paid a job and a scheduling gap before
    * the metadata job even started. The k=0 total-token row rides along
    * (its prefix key substring_index('', ' ', -1) = '' self-matches the
    * total row — harmless, and grams are never empty so it can never
    * match a position key); keeping it makes aug self-sufficient for the
    * metadata. The blocks are vocabulary-sized; the model cache is
    * dropped as soon as the metadata job has run.
    *
    * The metadata job also yields the total-token count N — N then enters
    * the scoring plan as a LITERAL, killing the crossJoin broadcast stage
    * the old plan paid for it. Every model join takes its DISJOINT
    * per-order slice: the n broadcast hash tables then sum to ONE model
    * copy in executor memory — an unsliced shared relation would be
    * strictly worse, since under AQE each join materializes its own
    * broadcast (plan-asserted in LlmSpec: one exchange per order, every
    * one fed by the checkpoint scan, never by recomputed training). An
    * order whose slice exceeds the cap falls back to a keyed-shuffle join.
    */
  def prepare(model: DataFrame): PreparedModel = {
    val m = model.persist()
    val aug = m.alias("a")
      .join(m.select(col("gram").as("_pg"), col("cnt").as("_pc")),
        expr("substring_index(a.gram, ' ', a.k - 1)") === col("_pg"), "left")
      .select(col("a.gram").as("gram"), col("a.k").as("k"),
        col("a.cnt").as("cnt"), col("_pc").as("pfx"))
      .localCheckpoint(false)
    val meta = aug.groupBy("k").agg(count(lit(1)).as("rows"),
      max(when(col("k") === 0, col("cnt"))).as("n0")).collect()
    m.unpersist()
    val sliceRows: Map[Int, Long] =
      meta.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val totalN: Long = meta.collectFirst {
      case r if r.getInt(0) == 0 => r.getLong(2)
    }.getOrElse(0L)
    PreparedModel(aug, sliceRows, totalN)
  }

  /** One row per token position with one micro log10-probability term
    * column PER MODEL (`_tm_0`, `_tm_1`, …) — the shared core of [[score]]
    * and [[dsirWeights]]. The corpus-sized position relation is built and
    * scanned ONCE however many models score it (two for DSIR — the fused
    * form halves the corpus work vs two score() passes); each model adds
    * only its vocab-sized sliced joins.
    */
  private def termMicroRelation(df: DataFrame, models: Seq[PreparedModel],
      textCol: String, idCol: String, n: Int, alpha: Double): DataFrame = {
    require(n >= 1 && n <= 5, s"order must be in [1, 5], got $n")
    val prepared = models
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    // One row per token position, identified only by the HIGHEST-order gram
    // ending there (its k_max-gram string) — every lower-order gram and
    // context is a codegen'd substring_index over that one string, so the
    // exploded relation is NARROW (id, gram): no position index, no gram
    // arrays travelling through the explode. Positions i ≥ n−1 are the
    // order-n gram array (native kernel); the n−1 boundary positions
    // (first i+1 tokens each) are CONCATENATED onto that array before the
    // one explode — the whole position relation is ONE corpus scan, where
    // per-leg unions would re-scan the documents n times at n=5. k_max is
    // recovered from the gram itself (its word count = spaces + 1): main
    // grams have exactly n words, the order-(i+1) boundary gram exactly
    // i+1 — cheap codegen'd string arithmetic, no struct explode.
    val withGa = df
      .select(col(idCol), toks.as("_toks"))
      .where(size(col("_toks")) > 0)
    val mainArr = graft.functions.native.wordGrams(col("_toks"), n)
    val posArr =
      if (n == 1) mainArr
      else {
        val bArr = filter(
          array((0 until n - 1).map { i =>
            when(size(col("_toks")) > i,
              array_join(slice(col("_toks"), 1, i + 1), " "))
          }: _*),
          g => g.isNotNull)
        concat(bArr, mainArr)
      }
    val posRaw = withGa
      .select(col(idCol), explode(posArr).as("_gs"))
      .withColumn("_kmax",
        (length(col("_gs")) - length(translate(col("_gs"), " ", "")) + 1)
          .cast("int"))
    // gram of order k ending at the position = last k words of _gs; the
    // context count arrives WITH the gram row (model `pfx` column), so no
    // context columns travel through the explode and no context joins run
    def gk(k: Int): Column =
      when(col("_kmax") >= k, substring_index(col("_gs"), " ", -k))
    val pos = posRaw.select(Seq(col(idCol), col("_kmax")) ++
      (1 to n).map(k => gk(k).as(s"_g$k")): _*)
    // ONE keyed left join per order PER MODEL, carrying count AND context
    // count. The model side joins UNPROJECTED (renamed only AFTER the
    // join, via a SubqueryAlias that analysis erases), so each broadcast's
    // input is the bare Filter(k = const) over the checkpoint scan —
    // column pruning still reaches the scan, and the slices are disjoint,
    // so executor memory across a model's n hash tables is one model copy.
    val withCtx = prepared.zipWithIndex.foldLeft(pos) { case (d0, (pm, j)) =>
      (1 to n).foldLeft(d0) { case (d, k) =>
        val a = s"_m${j}_$k"
        val mk = pm.slice(k).alias(a)
        d.join(mk, d(s"_g$k") === col(s"$a.gram"), "left")
          .select(d.columns.map(d(_)) ++
            Seq(col(s"$a.cnt").as(s"_n${j}_$k"),
              col(s"$a.pfx").as(s"_x${j}_$k")): _*)
      }
    }
    // largest available order wins; each level dropped multiplies by alpha
    val kMax = col("_kmax")
    // alpha^drop as a CASE of repeated literal products — libm pow() is not
    // guaranteed bit-identical across engines; IEEE multiplication is
    def alphaPow(drop: Column): Column =
      (1 until n).foldLeft(when(drop <= 0, lit(1.0))) { case (w, d) =>
        w.when(drop === d, (1 to d).map(_ => lit(alpha)).reduce(_ * _))
      }.otherwise(lit(Double.NaN))
    def termMicrosOf(j: Int): Column = {
      // total token count N: collected with the metadata job, a plan literal
      val nLit = lit(prepared(j).totalN)
      val sCases = (n to 2 by -1).map { k =>
        (col(s"_n${j}_$k").isNotNull && kMax >= k,
          col(s"_n${j}_$k").cast("double") / col(s"_x${j}_$k"),
          kMax - k)
      } :+ ((col(s"_n${j}_1").isNotNull,
        col(s"_n${j}_1").cast("double") / nLit, kMax - 1)) :+
        ((lit(true), lit(1.0) / nLit, kMax - 1))
      val sCol = sCases.foldRight(lit(Double.NaN)) { case ((cond, v, drop), e) =>
        when(cond, v * alphaPow(drop)).otherwise(e)
      }
      val t = (log(sCol) / log(lit(10.0))) * 1e6
      // binary-value round, sign-aware (terms are ≤ 0)
      when(t >= 0, floor(t + 0.5)).otherwise(-floor(-t + 0.5)).cast("long")
    }
    withCtx.select(col(idCol) +:
      models.indices.map(j => termMicrosOf(j).as(s"_tm_$j")): _*)
  }

  /** Model slices at or under this row count are broadcast (a gram row is
    * tens of bytes — 2M rows ≈ low hundreds of MB of executor memory);
    * bigger slices join as keyed shuffles.
    */
  val MaxBroadcastRows: Long = 2000000L

  /** DSIR-style data-selection statistic (the LM form of Xie et al. 2023's
    * importance resampling): per document, the mean per-token log10
    * likelihood GAP between a TARGET-domain n-gram model and the
    * RAW-corpus model — `dsir_logratio = lm_raw − lm_target` (both are
    * mean NEGATIVE log10 probabilities, so positive ⇒ the doc is more
    * probable under the target domain than under the background, i.e.
    * worth up-weighting when composing a target-flavoured training mix).
    *
    * Both scores run the [[score]] machinery (exact integer micro-unit
    * term sums, 6-dp edge round), so the ratio is cross-engine exact.
    * Scale posture: two model-scoring passes over the corpus — each the
    * one-scan position relation score() builds — and the
    * models themselves are vocab-sized relations; nothing new shuffles.
    * An EMPTY target model (no docs matched the target filter) has no
    * distribution to score under: the result is the empty relation, not
    * a division by zero.
    */
  def dsirWeights(docs: DataFrame, target: DataFrame, raw: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id",
                  n: Int = 2, alpha: Double = 0.4): DataFrame =
    dsirWeights(docs, prepare(target), prepare(raw), textCol, idCol, n, alpha)

  /** [[dsirWeights]] over already-[[prepare]]d models. The empty-target
    * probe needs no job of its own: the prepared metadata carries N.
    */
  def dsirWeights(docs: DataFrame, target: PreparedModel, raw: PreparedModel,
                  textCol: String, idCol: String,
                  n: Int, alpha: Double): DataFrame = {
    if (target.totalN == 0L)
      docs.limit(0).select(col(idCol), lit(0L).as("n_tok"),
        lit(0.0).as("dsir_logratio"))
    else {
      // FUSED: one corpus-sized position relation scores under BOTH
      // models (each adds only its vocab-sized sliced joins), then one
      // keyed aggregate carries both micro sums — half the corpus work of
      // two score() passes, identical values (same per-term rounding,
      // same per-model sums)
      def lm(sumCol: Column): Column = graft.functions.Rounding.dround(
        -sumCol.cast("double") / (col("n_tok") * 1e6), 6)
      termMicroRelation(docs, Seq(target, raw), textCol, idCol, n, alpha)
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_tok"),
          sum("_tm_0").as("_st"), sum("_tm_1").as("_sr"))
        .select(col(idCol), col("n_tok"),
          graft.functions.Rounding.dround(
            lm(col("_sr")) - lm(col("_st")), 6).as("dsir_logratio"))
    }
  }

  /** CCNet's corpus split by LM perplexity: rank documents on
    * (lm_score, id) ascending and cut into `n` SQL-ntile buckets —
    * `head` = cleanest third, `middle`, `tail` = noisiest (Wenzek et al.
    * 2020 §4.3; downstream pipelines keep head+middle or reweight).
    * Bucketing reuses [[graft.analytics.Quantiles.exactNtile]], so there
    * is NO global window: a value-domain probe or the keyed two-stage
    * decomposition, both cluster-safe at any corpus size. Bucket numbering
    * is exactly the SQL `ntile(n) OVER (ORDER BY score, id)` division
    * (first `total mod n` buckets get the extra row), replayable verbatim
    * in the oracle.
    */
  def perplexityBuckets(scored: DataFrame, scoreCol: String = "lm_score",
                        idCol: String = "doc_id", n: Int = 3,
                        coarseWidth: Double = 0.25): DataFrame = {
    // exactNtile consumes its input twice (value-domain probe + the
    // bucketed result); a lazy localCheckpoint of the NARROW (id, score)
    // projection runs the expensive LM scoring once — 16 bytes/row of
    // block storage, vs re-scoring the corpus (the same one-materialize-
    // many-consumers discipline as dedup_winnow)
    val b = graft.analytics.Quantiles.exactNtile(
      scored.select(col(idCol), col(scoreCol)).localCheckpoint(false),
      scoreCol, idCol, n,
      coarseWidth = coarseWidth, bucketCol = "_nt")
    val label =
      if (n == 3)
        when(col("_nt") === 1, "head")
          .when(col("_nt") === 2, "middle").otherwise("tail")
      else concat(lit("b"), col("_nt"))
    b.select(col(idCol), col(scoreCol), label.as("bucket"))
  }
}
