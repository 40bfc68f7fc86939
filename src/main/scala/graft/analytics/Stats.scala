package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hypothesis-test statistics for experiment readouts — the A/B-test
  * counterpart of the drift checks in [[graft.profile.Psi]] (which compare
  * distributions; these compare MEANS with a significance-testable
  * statistic). Reference behavior: the profile→alert DQ loop extended to
  * the standard experimentation readout.
  */
object Stats {

  /** Welch's unequal-variance t-test between the `value` means of two
    * relations: one row `(n_a, n_b, mean_a, mean_b, t, dof)` (t and the
    * Welch–Satterthwaite dof rounded to 4 dp, means to 6 dp).
    *
    * Determinism contract: values are rounded to CENTS with the
    * half-UP form floor(x·100 + 0.5) — deliberately NOT Rounding.cents
    * (half-away-from-zero): the two differ by one cent on negative .5
    * boundaries, and the oracles replay this exact floor form — and
    * summed as exact longs, so the
    * sufficient statistics (n, Σx, Σx²) are partition-invariant and
    * bit-identical on any engine; everything after the aggregate is
    * stateless single-row IEEE arithmetic on those exact sums. The t
    * statistic is scale-invariant, so computing it in cent units changes
    * nothing; only the reported means are rescaled. Σx² stays in long
    * range for |x| ≤ ~3·10⁵ cents over ~10⁹ rows; beyond that, swap the
    * sums to decimal(38,0).
    *
    * Scale shape: ONE wide aggregate of six conditional sums over the
    * union of the two sides (map-side combined — per-task state is six
    * longs), then single-row arithmetic. Comparing two 100 TB arms is one
    * exchange of one row per task.
    */
  def welchTTest(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    val cents = floor(value.cast("double") * 100 + lit(0.5)).cast("long")
    val u = a.where(value.isNotNull)
      .select(cents.as("_x"), lit(0).as("_side"))
      .unionByName(b.where(value.isNotNull)
        .select(cents.as("_x"), lit(1).as("_side")))
    val row = u.agg(
      sum(when(col("_side") === 0, 1L).otherwise(0L)).as("_n1"),
      sum(when(col("_side") === 0, col("_x")).otherwise(0L)).as("_s1"),
      sum(when(col("_side") === 0, col("_x") * col("_x")).otherwise(0L)).as("_ss1"),
      sum(when(col("_side") === 1, 1L).otherwise(0L)).as("_n2"),
      sum(when(col("_side") === 1, col("_x")).otherwise(0L)).as("_s2"),
      sum(when(col("_side") === 1, col("_x") * col("_x")).otherwise(0L)).as("_ss2"))
    val n1 = col("_n1").cast("double"); val n2 = col("_n2").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    val m1 = s1 / n1; val m2 = s2 / n2
    // sample variances from exact sums (cent units)
    val v1 = (col("_ss1").cast("double") - s1 * s1 / n1) / (n1 - 1)
    val v2 = (col("_ss2").cast("double") - s2 * s2 / n2) / (n2 - 1)
    val se1 = v1 / n1; val se2 = v2 / n2
    val se = se1 + se2
    val t = (m1 - m2) / sqrt(se)
    val dof = se * se / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    row.select(
      col("_n1").as("n_a"), col("_n2").as("n_b"),
      graft.functions.Rounding.dround(m1 / 100, 6).as("mean_a"),
      graft.functions.Rounding.dround(m2 / 100, 6).as("mean_b"),
      graft.functions.Rounding.dround(t, 4).as("t"),
      graft.functions.Rounding.dround(dof, 4).as("dof"))
  }

  /** Two-proportion z-test — the conversion-rate sibling of
    * [[welchTTest]]: arms `a` and `b` each contribute a trial count and a
    * success count (rows satisfying `success`), compared under the pooled
    * standard error. One row `(n_a, k_a, n_b, k_b, rate_a, rate_b, z)`.
    *
    * Same shape and determinism contract: ONE wide aggregate of four
    * conditional counts over the union (per-task state is four longs),
    * then single-row IEEE arithmetic on exact integers.
    */
  def proportionZTest(a: DataFrame, b: DataFrame, success: Column): DataFrame = {
    val k = when(success, 1L).otherwise(0L)
    val u = a.select(k.as("_k"), lit(0).as("_side"))
      .unionByName(b.select(k.as("_k"), lit(1).as("_side")))
    val row = u.agg(
      sum(when(col("_side") === 0, 1L).otherwise(0L)).as("_n1"),
      sum(when(col("_side") === 0, col("_k")).otherwise(0L)).as("_k1"),
      sum(when(col("_side") === 1, 1L).otherwise(0L)).as("_n2"),
      sum(when(col("_side") === 1, col("_k")).otherwise(0L)).as("_k2"))
    val n1 = col("_n1").cast("double"); val n2 = col("_n2").cast("double")
    val p1 = col("_k1").cast("double") / n1
    val p2 = col("_k2").cast("double") / n2
    val pp = (col("_k1") + col("_k2")).cast("double") /
      (col("_n1") + col("_n2")).cast("double")
    val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n1 + lit(1.0) / n2))
    row.select(
      col("_n1").as("n_a"), col("_k1").as("k_a"),
      col("_n2").as("n_b"), col("_k2").as("k_b"),
      graft.functions.Rounding.dround(p1, 6).as("rate_a"),
      graft.functions.Rounding.dround(p2, 6).as("rate_b"),
      graft.functions.Rounding.dround(z, 4).as("z"))
  }
}
