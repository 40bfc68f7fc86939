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
  * Scale shape: both sides collapse into ONE wide aggregate of 2·nBins
  * conditional sums (map-side combined — per-task state is 2·nBins longs),
  * so comparing two 100 TB relations shuffles O(nBins × tasks) longs and
  * the PSI itself is stateless arithmetic on the single result row. The
  * bin edges are CONFIG (lo/hi/nBins), not data — no quantile pass, no
  * driver arithmetic proportional to anything but the bin count.
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
    *
    * Plan: ONE wide aggregate over the union of the two sides — 2·nBins
    * conditional sums (map-side combined, per-task state 2·nBins longs),
    * then the whole PSI is stateless column arithmetic on the single
    * result row. One exchange total, no joins, no spine.
    */
  def psi(base: DataFrame, cur: DataFrame, value: Column,
          lo: Double, hi: Double, nBins: Int): DataFrame = {
    // NULLs are excluded EXPLICITLY (not silently, via a null bin matching
    // no conditional sum) so n_base/n_cur mean "non-null values compared"
    // on both this engine and any SQL replay — the same rule
    // [[graft.stream.Drift.psiWindows]] applies.
    val u = base.where(value.isNotNull)
      .select(bin(value, lo, hi, nBins).as("_bin"), lit(0).as("_side"))
      .unionByName(cur.where(value.isNotNull)
        .select(bin(value, lo, hi, nBins).as("_bin"), lit(1).as("_side")))
    val aggs = (0 until nBins).flatMap(i => Seq(
      sum(when(col("_side") === 0 && col("_bin") === i, 1L).otherwise(0L)).as(s"_b$i"),
      sum(when(col("_side") === 1 && col("_bin") === i, 1L).otherwise(0L)).as(s"_c$i")))
    val row = u.agg(aggs.head, aggs.tail: _*)
    val totB = (0 until nBins).map(i => col(s"_b$i")).reduce(_ + _)
    val totC = (0 until nBins).map(i => col(s"_c$i")).reduce(_ + _)
    // PSI terms are nonnegative ((p−q) and ln(p/q) share sign), so the
    // binary-value floor(x+0.5) round — the cross-engine-proven form from
    // [[graft.functions.Rounding]] — needs no negative branch. Terms are
    // summed as exact micro-unit integers, never order-dependent doubles.
    val termsMicros = (0 until nBins).map { i =>
      val p = (col(s"_b$i") + 0.5) / (totB.cast("double") + nBins * 0.5)
      val q = (col(s"_c$i") + 0.5) / (totC.cast("double") + nBins * 0.5)
      floor((p - q) * log(p / q) * 1e6 + lit(0.5)).cast("long")
    }
    row.select(
      (termsMicros.reduce(_ + _).cast("double") / 1e6).as("psi"),
      totB.cast("long").as("n_base"), totC.cast("long").as("n_cur"))
  }

  /** Two-sample chi-square homogeneity statistic over the SAME fixed
    * config binning as [[psi]] — the classical significance-testable drift
    * check (PSI scores shape divergence but has no reference distribution;
    * the chi-square statistic with its degrees of freedom plugs into a
    * standard table). One row `(chi2, dof, n_base, n_cur)`.
    *
    * Per-bin expected counts under homogeneity: `e1 = r·N1/N`,
    * `e2 = r·N2/N` with `r` the combined bin count; the statistic is
    * `Σ (o1−e1)²/e1 + (o2−e2)²/e2` over bins with `r > 0`, and
    * `dof = (#nonempty bins − 1)`. Both sides must be non-empty.
    *
    * Same determinism contract as [[psi]]: each term is nonnegative,
    * rounded to micro-units with the binary-value floor and summed as
    * exact longs — never an order-dependent double sum.
    *
    * Plan: unlike [[psi]]'s 2·nBins-conditional-sum wide aggregate (whose
    * per-bin expressions inline the total sums — an O(nBins²) Catalyst
    * tree that costs ~1 s of pure driver planning at nBins = 10), this is
    * RELATIONAL in the bin: one map-side-combined keyed count (≤ nBins
    * groups), a one-row totals aggregate broadcast back, constant-size
    * per-row term arithmetic, one final aggregate. Same one data-sized
    * exchange; generic in nBins. Bins absent from the count relation are
    * exactly the r = 0 bins — zero term, excluded from dof — so no spine
    * is needed.
    */
  def chi2(base: DataFrame, cur: DataFrame, value: Column,
           lo: Double, hi: Double, nBins: Int): DataFrame = {
    val u = base.where(value.isNotNull)
      .select(bin(value, lo, hi, nBins).as("_bin"), lit(0).as("_side"))
      .unionByName(cur.where(value.isNotNull)
        .select(bin(value, lo, hi, nBins).as("_bin"), lit(1).as("_side")))
    val perBin = u.groupBy("_bin").agg(
      sum(when(col("_side") === 0, 1L).otherwise(0L)).as("_b"),
      sum(when(col("_side") === 1, 1L).otherwise(0L)).as("_c"))
    val tot = perBin.agg(sum("_b").as("_tb"), sum("_c").as("_tc"))
    val b = col("_b").cast("double"); val c = col("_c").cast("double")
    val r = b + c
    val e1 = r * col("_tb").cast("double") / (col("_tb") + col("_tc")).cast("double")
    val e2 = r * col("_tc").cast("double") / (col("_tb") + col("_tc")).cast("double")
    perBin.crossJoin(broadcast(tot))
      .select(
        when(r > 0,
          floor(((b - e1) * (b - e1) / e1 + (c - e2) * (c - e2) / e2) * 1e6
            + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("_tm"),
        when(col("_b") + col("_c") > 0, 1L).otherwise(0L).as("_nz"),
        col("_tb"), col("_tc"))
      .agg(sum("_tm").as("_s"), sum("_nz").as("_z"),
        max("_tb").as("_tb"), max("_tc").as("_tc"))
      .select(
        (col("_s").cast("double") / 1e6).as("chi2"),
        (col("_z") - 1).cast("long").as("dof"),
        col("_tb").cast("long").as("n_base"),
        col("_tc").cast("long").as("n_cur"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the nonparametric
    * drift test that needs NO binning config (PSI's lo/hi/nBins): the max
    * gap between the two empirical CDFs, evaluated at every observed value,
    * plus where it occurs. Complements [[psi]]: KS localizes the worst
    * divergence, PSI scores the whole shape.
    *
    * Scale shape: each side collapses to per-value counts first (map-side
    * combined — the relation entering any window is HISTOGRAM-sized, one
    * row per distinct value, never corpus-sized; continuous signals are
    * expected pre-quantized, the library-wide 4-6 dp convention). The
    * cumulative counts then use the quantile machinery's two-level prefix
    * shape: per-COARSE-BUCKET subtotals (one keyed agg), exclusive bucket
    * offsets via a window over the bucket relation (#buckets rows ≈
    * domain/`bucketWidth`), and a per-bucket keyed window for the
    * within-bucket running sum — no window partition ever exceeds
    * max(bucketWidth, #buckets) rows regardless of the value domain. The
    * CDF gap is exact long arithmetic divided once per row; the argmax is a
    * `TakeOrdered(1)` on the unrounded gap with the value as tie-break.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, value: Column,
                  bucketWidth: Int = 1024, scale: Int = 6): DataFrame = {
    require(bucketWidth >= 2, s"bucketWidth must be >= 2: $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val ca = a.where(value.isNotNull).select(value.as("v"))
      .groupBy("v").agg(count(lit(1)).as("na"))
    val cb = b.where(value.isNotNull).select(value.as("v"))
      .groupBy("v").agg(count(lit(1)).as("nb"))
    val j = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
      .withColumn("bk", floor(col("v").cast("double") / bucketWidth).cast("long"))
      // distinct-value-sized, and consumed by THREE branches (bucket
      // offsets, totals, per-value CDF) — the lazy checkpoint stops each
      // branch re-running both count aggregates and the full-outer join
      .localCheckpoint(false)
    // exclusive prefix offsets per coarse bucket (window over #buckets rows)
    val wb = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = j.groupBy("bk").agg(sum("na").as("ba"), sum("nb").as("bb"))
      .select(col("bk"),
        (sum(col("ba")).over(wb) - col("ba")).as("oa"),
        (sum(col("bb")).over(wb) - col("bb")).as("ob"))
    val tot = j.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val wv = Window.partitionBy("bk").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    j.join(off, "bk")
      .select(col("v"),
        (col("oa") + sum(col("na")).over(wv)).as("cna"),
        (col("ob") + sum(col("nb")).over(wv)).as("cnb"))
      .crossJoin(broadcast(tot))
      // an EMPTY side's empirical CDF is identically 0 (its sum is over no
      // observations): D degenerates to the other side's max CDF = 1 — the
      // maximal-drift signal, not a divide-by-zero crash. Mirrored in the
      // oracle's CASE form.
      .select(col("v"),
        abs(when(col("ta") > 0, col("cna").cast("double") / col("ta"))
            .otherwise(lit(0.0)) -
          when(col("tb") > 0, col("cnb").cast("double") / col("tb"))
            .otherwise(lit(0.0))).as("d"))
      .orderBy(col("d").desc, col("v"))
      .limit(1)
      .select(graft.functions.Rounding.dround(col("d"), scale).as("ks"),
        col("v").as("at_value"))
  }
}
