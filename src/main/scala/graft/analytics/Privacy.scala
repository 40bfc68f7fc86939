package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release primitives: ε-differentially-private counts
  * via the discrete (two-sided geometric) Laplace mechanism — the standard
  * release shape for per-group statistics of a training corpus whose group
  * memberships are sensitive (Dwork et al. 2006; the discrete sampler is
  * the difference-of-geometrics construction, Ghosh et al. 2009, "Universally
  * Utility-Maximizing Privacy Mechanisms").
  *
  * The noise draw is SEEDED, from the sampler family's deterministic hash
  * draw ([[graft.llm.Corpus.hashUnit]]): `Z = G₁ − G₂` with
  * `Gᵢ = floor(−ln(1−uᵢ)/ε)` geometric. In production the seed is a secret
  * held by the release process (a predictable draw voids the DP guarantee);
  * the determinism here is the same testability convention as every sampler
  * in the library — given (seed, ε), the release is bit-reproducible across
  * engines, partitionings and reruns, which is what lets an oracle check
  * the mechanism's arithmetic end to end.
  *
  * Scale shape: one map-side-combined keyed count, then pure per-row
  * columnar noise arithmetic — releasing per-group counts of a 100 TB
  * corpus is a single aggregate; the noise stage touches one row per group.
  */
object Privacy {

  /** Geometric tail draw `floor(−ln(1−u)/ε)`: u ∈ [0,1) ⇒ 1−u ∈ (0,1] ⇒
    * the argument is finite and ≥ 0.
    */
  private def geometric(u: Column, eps: Double): Column =
    floor(-log(lit(1.0) - u) / lit(eps))

  /** ε-DP QUANTILE via the exponential mechanism (McSherry-Talwar 2007) —
    * the privacy family's first NON-additive-noise release: instead of
    * noising a statistic, a candidate is SAMPLED with probability
    * ∝ exp(ε·u/2Δu), realized as the Gumbel-max trick (argmax of
    * score + Gumbel noise ≡ the exponential-mechanism draw), with the
    * same seeded per-(group, candidate) hash draw as every sampler here.
    *
    * Candidates are the right edges of `nBins` fixed-width bins over
    * [lo, hi] (values clamped); utility of candidate k is
    * `−|rank_k − q·n|` where rank_k counts values in bins ≤ k, computed
    * in exact integers as `−|100·rank_k − qi·n|` with `qi = round(100q)`,
    * so the score arithmetic replays across engines (the Gumbel chain is
    * per-row IEEE ops on the deterministic draw). Releases
    * `(groupCol, dp_value)` — one row per group, ε cost independent of
    * nBins (one mechanism invocation per group).
    *
    * Neighbor convention: the ε accounting is under BOUNDED (swap)
    * neighbors — one record changes value, n fixed — where the scaled
    * utility `|100·rank − qi·n|` moves by at most 100 (Δu = 100, matching
    * the `eps/200 = ε/2Δu` coefficient below). Under add/remove neighbors
    * both rank and n change (Δu ≤ 100 + qi), so an unbounded-DP caller
    * should budget this release as up to `ε·(100+qi)/100 < 2ε`.
    */
  def dpQuantile(df: DataFrame, groupCol: String, value: Column, q: Double,
                 lo: Double, hi: Double, nBins: Int = 100,
                 eps: Double = 1.0, seed: Long = 11L): DataFrame = {
    require(eps > 0 && q > 0 && q < 1, s"bad (eps, q) = ($eps, $q)")
    // nBins ≤ 1000 keeps `_key = fingerprint·1000 + bin` collision-free
    // across groups; hi > lo keeps the bin width finite and positive.
    require(hi > lo, s"degenerate candidate range: [$lo, $hi]")
    require(nBins >= 1 && nBins <= 1000, s"nBins out of [1, 1000]: $nBins")
    val qi = math.round(q * 100).toInt
    val width = (hi - lo) / nBins
    val ev = df.where(value.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol),
        least(greatest(value, lit(lo)), lit(hi)).as("_v"))
    val binned = ev
      .select(col(groupCol), least(floor((col("_v") - lo) / width),
        lit((nBins - 1).toDouble)).cast("long").as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("c"))
    val spine = ev.sparkSession.range(nBins).select(col("id").as("bin"))
    val grid = binned.select(groupCol).distinct()
      .crossJoin(broadcast(spine))
      .join(binned, Seq(groupCol, "bin"), "left")
      .select(col(groupCol), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("bin")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val scored = grid
      .withColumn("rank", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .withColumn("_u2", -abs(lit(100L) * col("rank") - lit(qi) * col("n")))
      .withColumn("_key",
        graft.llm.TextStats.fingerprint(groupCol) * 1000L + col("bin"))
      .withColumn("_g", -log(-log(graft.llm.Corpus.hashUnit(col("_key"), seed))))
      .withColumn("_score", lit(eps / 200.0) * col("_u2") + col("_g"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_score").desc, col("bin"))
    scored.withColumn("_rn", row_number().over(wTop))
      .where(col("_rn") === 1)
      .select(col(groupCol),
        (lit(lo) + (col("bin") + 1) * width).as("dp_value"))
  }

  /** ε-DP noisy per-group counts: `(groupCol, n_noisy)` with
    * `n_noisy = max(0, n + G₁ − G₂)` (counts have sensitivity 1; the
    * nonnegative clamp is standard post-processing and costs no privacy).
    * The per-group draw keys on a polynomial fingerprint of the group
    * label, so a group's noise never changes across runs or partitionings.
    */
  def dpCounts(df: DataFrame, groupCol: String, eps: Double = 1.0,
               seed: Long = 7L): DataFrame = {
    require(eps > 0, s"epsilon must be positive: $eps")
    val key = graft.llm.TextStats.fingerprint(groupCol)
    val u1 = graft.llm.Corpus.hashUnit(key, seed)
    val u2 = graft.llm.Corpus.hashUnit(key, seed + 1)
    // NULL group labels are excluded: fingerprint(NULL) is NULL, so the
    // draw — and the released count — would degenerate (engine-dependent
    // greatest/NULL semantics). A caller who wants a NULL slice released
    // must coalesce the label to an explicit sentinel first.
    df.where(col(groupCol).isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol),
        greatest(lit(0L),
          col("n") + (geometric(u1, eps) - geometric(u2, eps)).cast("long"))
          .as("n_noisy"))
  }

  /** ε-DP noisy histogram of `value` over `nBins` fixed-width bins spanning
    * [lo, hi) (the [[graft.profile.Psi.bin]] clamped binning): `(bin,
    * n_noisy)` with EVERY bin released — empty bins get a noisy draw too,
    * via the zero-filled bin spine, because releasing only occupied bins
    * leaks which bins were empty (the classic DP-histogram requirement).
    * Bin occupancy has sensitivity 1 per record, so the per-bin mechanism
    * is identical to [[dpCounts]]; the draw keys on the bin INDEX, so a
    * bin's noise never changes across runs or partitionings.
    *
    * Scale shape: one map-side-combined keyed count (≤ nBins groups), a
    * broadcast-spine left join of nBins rows, then per-row noise — the
    * 100 TB side is a single aggregate pass.
    */
  def dpHistogram(df: DataFrame, value: Column, lo: Double, hi: Double,
                  nBins: Int, eps: Double = 1.0, seed: Long = 7L): DataFrame = {
    require(eps > 0, s"epsilon must be positive: $eps")
    val counts = graft.profile.Psi.binnedCounts(
      df.where(value.isNotNull), value, lo, hi, nBins)
    val u1 = graft.llm.Corpus.hashUnit(col("bin"), seed)
    val u2 = graft.llm.Corpus.hashUnit(col("bin"), seed + 1)
    counts.select(col("bin"),
      greatest(lit(0L),
        col("n") + (geometric(u1, eps) - geometric(u2, eps)).cast("long"))
        .as("n_noisy"))
  }

  /** ε-DP noisy per-group MEAN of a bounded value — the release shape for
    * per-slice averages (mean document quality per source, mean spend per
    * cohort). Standard clamp-and-split construction: values are clamped
    * into [lo, hi] (bounding the sum's sensitivity at max(|lo|, |hi|)),
    * ε/2 buys discrete-Laplace noise on the clamped sum and ε/2 on the
    * count (sensitivity 1), and the released mean is noisy_sum /
    * max(1, noisy_n) — post-processing, no extra privacy cost.
    *
    * Determinism contract: clamped values are 10⁻⁴-unit exact longs (the
    * winsorize convention — the bounds are config, so every clamped value
    * is an exact multiple of 10⁻⁴), the geometric scales are written as
    * `−ln(1−u) · sensUnits / (ε/2)` with integer/dyadic operands so both
    * engines run identical IEEE ops, and the draws key on the group
    * fingerprint — bit-reproducible like [[dpCounts]].
    *
    * Scale shape: one map-side-combined keyed aggregate, then per-group
    * columnar noise — releasing per-slice means of a 100 TB table is one
    * exchange of two longs per group per task.
    */
  def dpMean(df: DataFrame, value: Column, groupCol: String,
             lo: Double, hi: Double, eps: Double = 1.0,
             seed: Long = 7L): DataFrame = {
    require(eps > 0, s"epsilon must be positive: $eps")
    require(hi > lo, s"need hi > lo: [$lo, $hi]")
    val units = 10000L
    val sensUnits = math.ceil(math.max(math.abs(lo), math.abs(hi)) * units).toLong
    val epsHalf = eps / 2
    val x = floor(least(greatest(value.cast("double"), lit(lo)), lit(hi))
      * units + lit(0.5)).cast("long")
    // NULL group labels excluded for the same reason as [[dpCounts]]:
    // a NULL fingerprint would NULL the draw and corrupt the release.
    val agg = df.where(value.isNotNull && col(groupCol).isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("_n"), sum(x).as("_s"))
    val key = graft.llm.TextStats.fingerprint(groupCol)
    def geo(s: Long, scaleUnits: Long): Column =
      floor(-log(lit(1.0) - graft.llm.Corpus.hashUnit(key, s))
        * scaleUnits / epsHalf)
    val noisySum = col("_s") + (geo(seed, sensUnits) - geo(seed + 1, sensUnits)).cast("long")
    val noisyN = greatest(lit(1L),
      col("_n") + (geo(seed + 2, 1L) - geo(seed + 3, 1L)).cast("long"))
    agg.select(col(groupCol), noisyN.as("n_noisy"),
      graft.functions.Rounding.dround(
        noisySum.cast("double") / units / noisyN, 6).as("mean_noisy"))
  }

  /** k-anonymity audit over a quasi-identifier column set (Sweeney 2002):
    * one row `(n_groups, n_violating, rows_at_risk, min_group_size)` —
    * a release is k-anonymous iff `n_violating = 0` (every
    * quasi-identifier combination is shared by ≥ k rows). The release
    * gate to run BEFORE [[dpCounts]]-style noisy publication, and the
    * audit that tells you which generalization level a join-linkable
    * extract needs.
    *
    * Scale shape: one map-side-combined keyed count over the
    * quasi-identifier tuple, then a second aggregate over the
    * group-cardinality relation — auditing a 100 TB extract is one
    * data-sized exchange.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("_n") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("_n") < k, col("_n")).otherwise(0L)).as("rows_at_risk"),
        min(col("_n")).as("min_group_size"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — [[kAnonymity]]'s
    * companion: a k-anonymous group whose SENSITIVE attribute is constant
    * still leaks it (the homogeneity attack), so each quasi-identifier
    * group must carry ≥ l distinct sensitive values. One row `(n_groups,
    * n_violating, min_diversity)`.
    *
    * Scale shape: distinct-per-group via a two-level keyed aggregate
    * (first `(quasi, sensitive)` distinct — map-side combined — then the
    * per-group distinct count), then a group-cardinality aggregate; no
    * count-distinct buffer ever holds a group's value set.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, s"need quasi columns and l >= 2")
    df.select((quasiCols :+ sensitiveCol).map(col): _*).distinct()
      .groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("_d"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("_d") < l, 1L).otherwise(0L)).as("n_violating"),
        min(col("_d")).as("min_diversity"))
  }

  /** ε-DP top-k selection by the PEELING exponential mechanism (McSherry-
    * Talwar iterated): k rounds, each drawing the remaining item with the
    * largest `ε/(2k)·count + Gumbel` score (the Gumbel-max trick — argmax
    * of utility-plus-Gumbel IS an exponential-mechanism draw), winner
    * removed between rounds. Counts have sensitivity 1 under the module's
    * bounded-neighbor convention; each round spends ε/k. The release is
    * the ORDERED SELECTION only — no counts leave (a selection release).
    *
    * Determinism: round r's Gumbel keys on `fingerprint(item)·31 + r`
    * through the seeded [[graft.llm.Corpus.hashUnit]] draw, so the
    * release replays bit-identically in the oracle and across
    * partitionings. Scale shape: one keyed count, then k
    * TakeOrderedAndProject(1) passes — per-partition top-1 then a
    * driver merge of ONE row per round; the driver never holds more
    * than k items.
    */
  def dpTopK(df: DataFrame, itemCol: String, k: Int,
             eps: Double = 1.0, seed: Long = 11L): DataFrame = {
    require(k >= 1 && k <= 64, s"k out of [1, 64]: $k")
    require(eps > 0, s"eps must be positive: $eps")
    val spark = df.sparkSession
    val counts = df.where(col(itemCol).isNotNull)
      .groupBy(col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // k rounds re-read it; cut lineage once
    val coef = eps / (2.0 * k)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = counts
        .where(!col("item").isin(chosen.map(_._2).toSeq: _*))
        .withColumn("_key",
          graft.llm.TextStats.fingerprint("item") * lit(31L) + lit(r.toLong))
        .withColumn("_g",
          -log(-log(graft.llm.Corpus.hashUnit(col("_key"), seed))))
        .withColumn("_s", lit(coef) * col("c") + col("_g"))
        .orderBy(col("_s").desc, col("item"))
        .select("item").limit(1).collect()
      if (top.isEmpty) exhausted = true
      else { chosen += ((r, top.head.getString(0))); r += 1 }
    }
    import spark.implicits._
    chosen.toSeq.toDF("rank", "item")
  }

  /** t-closeness audit (Li et al. 2007) — the anonymity triad's third
    * metric: an l-diverse group whose SENSITIVE distribution still skews
    * far from the table's leaks information (the skewness attack), so
    * each quasi-identifier group's sensitive-value distribution must sit
    * within distance `t` of the global one. Categorical sensitive values,
    * distance = total variation `½·Σ_v |p_g(v) − p(v)|` (the equal-ground
    * EMD). One row `(n_groups, n_violating, max_distance)`.
    *
    * Exactness: the sum runs over INTEGER terms on the common denominator
    * `N_g·N` — `Σ_{v∈group} (|c_gv·N − c_v·N_g| − c_v·N_g) + N·N_g`
    * (values absent from a group contribute `c_v·N_g`, folded in closed
    * form, so no value spine is materialized) — with ONE division per
    * group rounded at the edge, so the release replays bit-identically.
    *
    * Scale shape: two map-side-combined keyed counts ((quasi, v) and v),
    * a group-keyed join + aggregate, then a group-cardinality release;
    * the global count is a one-row scalar.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 t: Double): DataFrame = {
    require(quasiCols.nonEmpty && t > 0 && t <= 1,
      s"need quasi columns and t in (0, 1], got $t")
    val cgv = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_cgv"))
    val cv = df.groupBy(col(sensitiveCol).as("_sv"))
      .agg(count(lit(1)).as("_cv"))
    val ng = cgv.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_cgv")).as("_ng"))
      .select(quasiCols.zipWithIndex.map { case (q, i) =>
        col(q).as(s"_q$i") } :+ col("_ng"): _*)
    val n = df.count()
    // NULL-SAFE joins (<=>): groupBy treats NULL as a value (null keys
    // group together), so a NULL sensitive value or quasi key is a real
    // group in cgv/cv/ng — an equi-join would drop it (null != null) and
    // silently skew the per-group distance while still counting the rows
    // in N and N_g. The null-safe keys keep the integer identity exact.
    val dist = cgv
      .join(cv, cgv(sensitiveCol) <=> cv("_sv"))
      .join(ng, quasiCols.zipWithIndex.map { case (q, i) =>
        cgv(q) <=> ng(s"_q$i") }.reduce(_ && _))
      .groupBy(quasiCols.map(cgv(_)): _*)
      .agg(min(col("_ng")).as("_ng2"),
        sum(abs(col("_cgv") * n - col("_cv") * col("_ng")) -
          col("_cv") * col("_ng")).as("_part"))
      .select(graft.functions.Rounding.dround(
        (col("_part") + lit(n) * col("_ng2")).cast("double") /
          (lit(2.0) * col("_ng2") * n), 6).as("_d"))
    dist.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("_d") > t, 1L).otherwise(0L)).as("n_violating"),
      max(col("_d")).as("max_distance"))
  }

  /** A generalization LEVEL for [[generalizeUntilK]]: named quasi-identifier
    * expressions (coarser at higher levels — suppress a column to a
    * literal, bucket a numeric, truncate a code).
    */
  final case class GenLevel(level: Int, quasi: Seq[(String, Column)])

  /** k-anonymity REMEDIATION — [[kAnonymity]] audits, this fixes: walk the
    * generalization `levels` from most specific to most general and
    * release the FIRST level whose every quasi group holds ≥ k rows,
    * as `(level, quasi..., n)` group counts (the release shape — row-level
    * release would defeat the generalization). Returns the ladder's last
    * level if none satisfies (callers check `min(n)` — at the top level
    * everything is one group, so full suppression always satisfies k ≤ n).
    *
    * Scale shape: ONE map-side-combined keyed count per probed level
    * (≤ |levels|, a config constant — typically 3-4), each with a one-row
    * min aggregate; the release itself is group-cardinality-sized. No
    * level's probe reads more than the quasi projection.
    */
  def generalizeUntilK(df: DataFrame, levels: Seq[GenLevel],
                       k: Int): DataFrame = {
    require(levels.nonEmpty && k >= 2, s"need levels and k >= 2")
    val it = levels.iterator
    var chosen: DataFrame = null
    var done = false
    while (!done && it.hasNext) {
      val lv = it.next()
      val grouped = df
        .select(lv.quasi.map { case (n, c) => c.as(n) }: _*)
        .groupBy(lv.quasi.map { case (n, _) => col(n) }: _*)
        .agg(count(lit(1)).as("n"))
      val minRow = grouped.agg(min(col("n"))).collect().head
      // empty extract: no group violates — trivially k-anonymous
      val minN = if (minRow.isNullAt(0)) Long.MaxValue else minRow.getLong(0)
      chosen = grouped.select(lit(lv.level).as("level") +:
        lv.quasi.map { case (n, _) => col(n) } :+ col("n"): _*)
      done = minN >= k || !it.hasNext
    }
    chosen
  }
}
