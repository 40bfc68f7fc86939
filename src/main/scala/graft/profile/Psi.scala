package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch distribution-drift metrics: Population Stability Index between a
  * baseline and a current relation over a fixed, config-supplied binning —
  * the scheduled (daily/weekly) counterpart of the streaming min/max monitor
  * in [[graft.stream.Drift]]. Reference behavior: the profile→bounds→alert
  * DQ loop (de4ml `dataops/app/profile.py`), extended from range checks to a
  * distributional check.
  *
  * Scale shape: each side collapses to at most `nBins` rows via one
  * map-side-combined groupBy before anything is joined, so the comparison
  * of two 100 TB relations shuffles O(nBins × tasks) rows. The bin edges
  * are CONFIG (lo/hi/nBins), not data — no quantile pass, no driver
  * arithmetic proportional to anything but the bin count.
  *
  * Determinism: the per-bin PSI term mixes IEEE-exact arithmetic with one
  * `ln` (correctly rounded in practice but not guaranteed bit-identical
  * across libm implementations), so each term is rounded to 6 dp — the
  * granularity proven cross-engine by the tf-idf oracle — and the terms are
  * summed as exact micro-unit BIGINTs, never as order-dependent doubles.
  */
object Psi {

  /** Clamped fixed-width bin index in [0, nBins): values below `lo` land in
    * bin 0, values at/above `hi` in bin nBins-1 — drift OUT of the baseline
    * range must still be counted, not dropped.
    */
  def bin(value: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val w = (hi - lo) / nBins
    greatest(lit(0L), least(lit(nBins - 1L),
      floor((value.cast("double") - lo) / w).cast("long")))
  }

  /** Per-bin counts `(bin, n)` with every bin present (zero-filled via a
    * broadcast bin spine), so the smoothed probabilities are defined even
    * for empty bins.
    */
  def binnedCounts(df: DataFrame, value: Column, lo: Double, hi: Double,
                   nBins: Int): DataFrame = {
    val spine = df.sparkSession.range(0, nBins).select(col("id").as("bin"))
    val counts = df.select(bin(value, lo, hi, nBins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** PSI between `base` and `cur` on `value` over `nBins` fixed-width bins
    * spanning [lo, hi): one row `(psi, n_base, n_cur)`.
    *
    * Probabilities are Laplace-smoothed — p_i = (n_i + 0.5) / (N + nBins/2)
    * — so empty bins contribute a finite term instead of a log singularity.
    */
  def psi(base: DataFrame, cur: DataFrame, value: Column,
          lo: Double, hi: Double, nBins: Int): DataFrame = {
    val b = binnedCounts(base, value, lo, hi, nBins)
      .withColumnRenamed("n", "n_b")
    val c = binnedCounts(cur, value, lo, hi, nBins)
      .withColumnRenamed("n", "n_c")
    // nBins×nBins join of two bounded relations; totals via a broadcast
    // scalar crossJoin (no window, no collect).
    val totals = b.agg(sum("n_b").as("tot_b")).crossJoin(c.agg(sum("n_c").as("tot_c")))
    val joined = b.join(c, "bin").crossJoin(broadcast(totals))
    val p = (col("n_b") + 0.5) / (col("tot_b") + nBins * 0.5)
    val q = (col("n_c") + 0.5) / (col("tot_c") + nBins * 0.5)
    // PSI terms are nonnegative ((p−q) and ln(p/q) share sign), so the
    // binary-value floor(x+0.5) round — the cross-engine-proven form from
    // [[graft.functions.Rounding]] — needs no negative branch.
    val termMicros = floor((p - q) * log(p / q) * 1e6 + 0.5).cast("long")
    joined.select(termMicros.as("tm"), col("tot_b"), col("tot_c"))
      .groupBy("tot_b", "tot_c")
      .agg((sum("tm").cast("double") / 1e6).as("psi"))
      .select(col("psi"), col("tot_b").as("n_base"), col("tot_c").as("n_cur"))
  }
}
