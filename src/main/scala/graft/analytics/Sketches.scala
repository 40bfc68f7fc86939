package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-based aggregates: bounded-state approximations of the aggregations
  * whose exact forms carry state proportional to data cardinality. Unlike
  * Spark's built-ins (approx_count_distinct's HLL++ over xxhash64) these are
  * deterministic over the engine-agnostic [[graft.functions.PolyHash]]
  * basis, so their results — approximation error included — replay bit for
  * bit in any engine, which keeps them oracle-checkable and makes pipeline
  * re-runs reproducible.
  */
object Sketches {

  /** KMV distinct-count estimate of `idCol` (non-negative LONG) per value of
    * `groupCol`: `(groupCol, est_distinct)`. State is k longs per (group,
    * task) — constant in the data — against exact distinct's
    * one-row-per-distinct-value shuffle; standard error ≈ 1/√(k−2), and
    * groups with fewer than k distinct hashes report the EXACT count.
    */
  def kmvDistinctBy(df: DataFrame, groupCol: String, idCol: String,
                    k: Int = 64, seed: Long = 42L): DataFrame =
    df.groupBy(groupCol).agg(
      graft.functions.native.kmvDistinct(col(idCol), k, seed).as("est_distinct"))

  /** HyperLogLog distinct-count estimate (Flajolet et al. 2007) of `idCol`
    * per `groupCol` — the MERGEABLE-sketch companion of [[kmvDistinctBy]]:
    * where KMV keeps k minima, HLL keeps m = 64 one-byte registers whose
    * per-group state is a plain `max` aggregate — map-side combinable, so
    * a 100 TB cardinality readout shuffles 64 tiny rows per group however
    * many executors feed it. Deterministic over the [[graft.llm.Corpus
    * .mix32]] + affine PolyHash draw (NOT xxhash — the approximation error
    * itself replays bit-for-bit in the oracle):
    *
    *   bucket = h & 63, v = h >> 6 (< 2^24), rho = 25 − bitwidth(v)
    *   (25 when v = 0); register = max rho per (group, bucket);
    *   S = Σ 2^(26−reg) over all 64 registers (missing ⇒ reg 0 ⇒ 2^26 —
    *   EXACT integer, max 2^32); E = α·m²·2^26 / S, with the standard
    *   linear-counting fallback m·ln(m/zeros) when E ≤ 2.5m and empty
    *   buckets remain.
    *
    * Returns `(groupCol, est_hll, n_exact)` — the exact count rides along
    * as the sketch-quality readout (the ann_recall_eval convention).
    */
  def hllDistinctBy(df: DataFrame, groupCol: String, idCol: String,
                    seed: Long = 42L): DataFrame = {
    val rows = df.where(col(idCol).isNotNull)
    hllEstimate(hllRegisters(rows, groupCol, idCol, seed), groupCol)
      .join(rows.groupBy(groupCol)
        .agg(countDistinct(col(idCol)).as("n_exact")), groupCol)
  }

  /** The HLL register relation `(groupCol, bucket, reg)` — the sketch's
    * whole state, and the MERGE unit: registers from any corpus split
    * max-merge to exactly the one-shot registers (max is associative and
    * commutative), which is what makes the sketch incrementally
    * maintainable with a bit-exact append ≡ rebuild guarantee.
    */
  def hllRegisters(rows: DataFrame, groupCol: String, idCol: String,
                   seed: Long = 42L): DataFrame = {
    val P1 = graft.functions.PolyHash.P1
    val (a, b) = graft.llm.Corpus.hashConstants(seed)
    val hv = pmod(lit(a) * pmod(graft.llm.Corpus.mix32(col(idCol)), lit(P1))
      + lit(b), lit(P1))
    val v = shiftright(hv, 6)
    val rho = when(v === 0, lit(25)).otherwise(lit(25) - length(bin(v)))
    rows.select(col(groupCol), hv.bitwiseAND(lit(63L)).as("bucket"),
        rho.as("rho"))
      .groupBy(groupCol, "bucket").agg(max("rho").cast("int").as("reg"))
  }

  /** Estimate from a register relation: `(groupCol, est_hll)`. */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    val alpha = 0.7213 / (1 + 1.079 / 64.0)
    regs.groupBy(groupCol)
      .agg(count(lit(1)).as("nb"),
        sum(expr("shiftleft(cast(1 as bigint), 26 - reg)")).as("sp"))
      .select(col(groupCol), (lit(64) - col("nb")).as("zeros"),
        (lit(alpha) * 4096 * 67108864.0 /
          (col("sp") + (lit(64) - col("nb")) * lit(67108864L))).as("eraw"))
      .select(col(groupCol), graft.functions.Rounding.dround(
        when(col("zeros") > 0 && col("eraw") <= 160.0,
          lit(64.0) * log(lit(64.0) / col("zeros"))).otherwise(col("eraw")), 4)
        .as("est_hll"))
  }

  /** (Re)build a persisted HLL register store — the cardinality artifact
    * of the incremental family (64 ints per group, ~nothing on disk).
    */
  def buildHllStore(spark: org.apache.spark.sql.SparkSession, path: String,
      df: DataFrame, groupCol: String, idCol: String,
      seed: Long = 42L): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    graft.core.Layouts.writePartitioned(
      hllRegisters(df.where(col(idCol).isNotNull), groupCol, idCol, seed)
        .withColumn("bucket_part", pmod(col("bucket"), lit(8L))),
      path, "bucket_part")
  }

  /** Distinct-count estimates for history ∪ batch WITHOUT rescanning
    * history rows: the batch's registers max-merge with the stored ones —
    * bit-exactly the one-shot estimate on the union corpus (the sketch's
    * merge theorem, which the incremental gate pins against the one-shot
    * oracle). Read-only; an absent store contributes nothing.
    */
  def hllMergeProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, groupCol: String, idCol: String,
      seed: Long = 42L): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchRegs = hllRegisters(batch.where(col(idCol).isNotNull), groupCol,
      idCol, seed)
    val stored =
      if (fs.exists(p))
        graft.core.Layouts.read(spark, path).select(groupCol, "bucket", "reg")
      else batchRegs.limit(0) // schema-exact empty, whatever the group type
    val merged = batchRegs.unionByName(stored)
      .groupBy(groupCol, "bucket").agg(max("reg").as("reg"))
    hllEstimate(merged, groupCol)
  }

  // ---- mergeable QUANTILE sketch: binned counts, add-merge registers ---

  /** The quantile sketch's register relation `(groupCol, bin, cnt)` —
    * per-group counts over `nBins` fixed-width bins spanning [lo, hi]
    * (values clamped). Counts ADD across any corpus split (sum is
    * associative and commutative), so this sketch carries the same
    * bit-exact append ≡ rebuild algebra as the HLL registers: merged
    * registers equal the one-shot registers EXACTLY, and so does every
    * readout. The state is ≤ nBins longs per group however large the
    * corpus — the approx-percentile shape for a 100 TB column where an
    * exact per-group sort is off the table.
    */
  /** The clamped bin index of `value` — the ONE binning rule, shared by
    * the batch registers and [[graft.stream.StreamQuantiles]]' streaming
    * register maintenance (parity depends on both sides binning
    * identically).
    */
  private[graft] def quantileBin(value: Column, lo: Double, hi: Double,
                                 nBins: Int): Column = {
    require(hi > lo, s"degenerate range [$lo, $hi]")
    require(nBins >= 1 && nBins <= 65536, s"nBins out of range: $nBins")
    val w = (hi - lo) / nBins
    val v = least(greatest(value, lit(lo)), lit(hi))
    least(floor((v - lo) / w), lit((nBins - 1).toDouble)).cast("long")
  }

  def quantileRegisters(df: DataFrame, groupCol: String, value: Column,
                        lo: Double, hi: Double, nBins: Int): DataFrame =
    df.where(value.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol),
        quantileBin(value, lo, hi, nBins).as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("cnt"))

  /** Quantile readout from a register relation: one row per (group, q) —
    * `(groupCol, q, est_q, n)`. Rank `ceil(q·n)` lands in the bin where
    * the cumulative count first reaches it; the estimate interpolates
    * linearly inside that bin (`lo + w·(bin + (rank − cum_before)/cnt)`,
    * the textbook binned-percentile rule). Per-row IEEE arithmetic over
    * exact integer counts — replays bit-identically in the oracle; the
    * approximation error is bounded by one bin width by construction.
    */
  def quantileEstimate(regs: DataFrame, groupCol: String, qs: Seq[Double],
                       lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs: $qs")
    import regs.sparkSession.implicits._
    val w = (hi - lo) / nBins
    val wCum = Window.partitionBy(groupCol).orderBy("bin")
    val wAll = Window.partitionBy(groupCol)
    regs.withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .crossJoin(broadcast(qs.toDF("q")))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
      .where(col("cum") >= col("rank") &&
        (col("cum") - col("cnt")) < col("rank"))
      .select(col(groupCol), col("q"),
        graft.functions.Rounding.dround(lit(lo) + lit(w) * (col("bin") +
          (col("rank") - (col("cum") - col("cnt"))).cast("double") / col("cnt")),
          4).as("est_q"),
        col("n"))
  }

  /** [[quantileRegisters]] → [[quantileEstimate]] in one call, with the
    * exact per-group count riding along inside `n` (it is exact by
    * construction — the registers partition the rows).
    */
  def quantileSketchBy(df: DataFrame, groupCol: String, value: Column,
                       lo: Double, hi: Double, nBins: Int,
                       qs: Seq[Double]): DataFrame =
    quantileEstimate(quantileRegisters(df, groupCol, value, lo, hi, nBins),
      groupCol, qs, lo, hi, nBins)

  /** (Re)build a persisted quantile register store — the percentile
    * artifact of the incremental family (≤ nBins longs per group).
    */
  def buildQuantileStore(spark: org.apache.spark.sql.SparkSession,
      path: String, df: DataFrame, groupCol: String, value: Column,
      lo: Double, hi: Double, nBins: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    graft.core.Layouts.writePartitioned(
      quantileRegisters(df, groupCol, value, lo, hi, nBins)
        .withColumn("bucket_part", pmod(col("bin"), lit(8L))),
      path, "bucket_part")
  }

  /** Quantiles of history ∪ batch WITHOUT rescanning history rows: the
    * batch's registers add-merge with the stored ones — bit-exactly the
    * one-shot readout on the union corpus (count addition is the merge
    * theorem here, pinned by the incremental gate against the one-shot
    * oracle). Read-only; an absent store contributes nothing.
    */
  def quantileMergeProbe(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, groupCol: String, value: Column,
      lo: Double, hi: Double, nBins: Int, qs: Seq[Double]): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchRegs = quantileRegisters(batch, groupCol, value, lo, hi, nBins)
    val stored =
      if (fs.exists(p))
        graft.core.Layouts.read(spark, path).select(groupCol, "bin", "cnt")
      else batchRegs.limit(0)
    val merged = batchRegs.unionByName(stored)
      .groupBy(groupCol, "bin").agg(sum("cnt").as("cnt"))
    quantileEstimate(merged, groupCol, qs, lo, hi, nBins)
  }

  /** Theta-style set-operation estimates between two id sets from their KMV
    * sketches — the corpus-overlap diagnostic (shared users between event
    * cohorts, shared documents between sources) WITHOUT a distinct-join:
    * each side reduces to its k-minima array (one fixed-size row), the
    * combination is a single-row cross join.
    *
    *   θ = min(θ_A, θ_B) bounds the hash region BOTH sketches observed
    *   exhaustively (θ_side = k-th minimum, or P1 when the side has fewer
    *   than k distinct hashes — then its sketch is exact);
    *   est∩ = |{h ∈ K_A ∩ K_B : h < θ}| · P1 / θ;
    *   est∪ = est_A + est_B − est∩.
    *
    * When both sides are exact (θ = P1) every estimate is the exact count.
    * All arithmetic is exact-integer products (< 2^40) and single IEEE
    * divisions/additions over the deterministic PolyHash draw — the oracle
    * replays the identical sketches and estimates.
    *
    * Returns one row: `(est_a, est_b, est_intersection, est_union)`,
    * rounded at 4 dp.
    */
  def kmvOverlap(dfA: DataFrame, dfB: DataFrame, idCol: String,
                 k: Int = 64, seed: Long = 42L): DataFrame = {
    val P1 = graft.functions.PolyHash.P1
    val kd = (k - 1).toDouble * P1.toDouble
    def side(df: DataFrame, out: String): DataFrame =
      df.agg(graft.functions.native.kmvMinima(col(idCol), k, seed).as(out))
    def theta(mins: Column): Column =
      when(size(mins) < k, lit(P1)).otherwise(element_at(mins, -1))
    def est(mins: Column, th: Column): Column =
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit(kd) / th.cast("double"))
    val joined = side(dfA, "ka").crossJoin(side(dfB, "kb"))
      .withColumn("_ta", theta(col("ka")))
      .withColumn("_tb", theta(col("kb")))
      .withColumn("_th", least(col("_ta"), col("_tb")))
      .withColumn("_common",
        size(filter(array_intersect(col("ka"), col("kb")), h => h < col("_th"))))
      .withColumn("_ea", est(col("ka"), col("_ta")))
      .withColumn("_eb", est(col("kb"), col("_tb")))
      .withColumn("_ei",
        (col("_common") * lit(P1)).cast("double") / col("_th").cast("double"))
    def r4(c: Column) = graft.functions.Rounding.dround(c, 4)
    joined.select(
      r4(col("_ea")).as("est_a"), r4(col("_eb")).as("est_b"),
      r4(col("_ei")).as("est_intersection"),
      r4(col("_ea") + col("_eb") - col("_ei")).as("est_union"))
  }

  /** Per-row Count-Min bucket columns for a LONG key: one [[graft.llm
    * .Corpus.mix32]] round, then depth independent affine draws (seed+j
    * constants) reduced mod `width`. Exact BIGINT arithmetic throughout —
    * the draw replays verbatim in oracle SQL.
    */
  private def cmBuckets(key: Column, depth: Int, width: Int,
                        seed: Long): Seq[Column] = {
    val P1 = graft.functions.PolyHash.P1
    val m = graft.llm.Corpus.mix32(key) % P1
    (0 until depth).map { j =>
      val (a, b) = graft.llm.Corpus.hashConstants(seed + j)
      ((m * a + b) % P1) % width
    }
  }

  /** Count-Min sketch of a LONG key column — bounded-memory frequency
    * estimation (Cormode & Muthukrishnan 2005, public). The sketch is a
    * RELATION of at most depth × width rows `(j, bucket, cnt)`, built by
    * ONE keyed aggregate (map-side combined; shuffle output is
    * config-bounded no matter the key cardinality — the whole point at
    * 100 TB, where exact per-key counting shuffles one row per distinct
    * key). Sketches MERGE by unioning and re-summing `(j, bucket)` —
    * batch, partition and crawl increments compose. Deterministic over the
    * engine-agnostic mix32 draw, so estimates (error included) are
    * oracle-replayable.
    */
  def cmSketch(df: DataFrame, key: Column, depth: Int = 4,
               width: Int = 1024, seed: Long = 42L): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    df.select(posexplode(array(cmBuckets(key, depth, width, seed): _*)))
      .groupBy(col("pos").as("j"), col("col").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `keys` against a [[cmSketch]] relation:
    * est(key) = min over j of cnt[j][bucket_j(key)] (0 when a bucket is
    * absent). Conservative by construction — est ≥ true count, and within
    * εN of it (width ≈ e/ε) with probability ≥ 1 − e^−depth — the classic
    * guarantee, spec-pinned as est ≥ exact on real data. The probe is a
    * depth-row explode of the key set joined against the (config-bounded,
    * broadcastable) sketch.
    *
    * HAZARD: the sketch relation carries no record of its (depth, width,
    * seed) — a probe with a different shape or seed joins against wrong
    * buckets and returns silently wrong (no-longer-conservative) estimates.
    * This raw-relation entry exists for streaming snapshots and oracle
    * replay, where the caller re-supplies the build config; library code
    * should hold a [[CmSketch]], which carries the config with the relation
    * and makes the mismatch unrepresentable.
    */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                 depth: Int = 4, width: Int = 1024,
                 seed: Long = 42L): DataFrame =
    keys.select(col(keyCol),
        posexplode(array(cmBuckets(col(keyCol), depth, width, seed): _*)))
      .select(col(keyCol), col("pos").as("j"), col("col").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cnt_est"))

  /** [[cmSketch]] + config in one handle — the safe construction path. */
  def buildCmSketch(df: DataFrame, key: Column, depth: Int = 4,
                    width: Int = 1024, seed: Long = 42L): CmSketch =
    CmSketch(cmSketch(df, key, depth, width, seed), depth, width, seed)
}

/** A Count-Min sketch relation together with the (depth, width, seed) it was
  * built under (the same handle pattern as `llm.IvfIndex`). Probing or
  * merging through this class cannot mismatch the hash draw — the failure
  * mode of the raw [[Sketches.cmEstimate]] relation API, where a probe with
  * a different shape or seed silently reads wrong buckets.
  */
final case class CmSketch(buckets: DataFrame, depth: Int, width: Int,
                          seed: Long) {
  def estimate(keys: DataFrame, keyCol: String): DataFrame =
    Sketches.cmEstimate(buckets, keys, keyCol, depth, width, seed)

  /** Merge two sketches of the SAME configuration (union + re-sum); batch,
    * partition and crawl increments compose. Config mismatch throws —
    * sketches under different draws are not comparable.
    */
  def merge(other: CmSketch): CmSketch = {
    require(depth == other.depth && width == other.width && seed == other.seed,
      s"CMS config mismatch: ($depth,$width,$seed) vs " +
        s"(${other.depth},${other.width},${other.seed})")
    copy(buckets = buckets.unionAll(other.buckets)
      .groupBy("j", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt")))
  }
}
