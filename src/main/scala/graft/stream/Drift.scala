package graft.stream

import graft.core.FieldBounds
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming data-drift monitor — the continuous twin of the batch DQ loop
  * (Profile → bounds → DqAlerts): a watermarked tumbling-window profile of
  * the numeric columns, checked against the baseline bounds the profiler
  * generated, emitting one drift alert per (window, column, kind).
  *
  * State per window is a fixed handful of aggregates per column (min/max/
  * sum/count — mergeable, map-side combined), GC'd by the watermark: the
  * monitor's memory is O(columns × open windows), never data-sized, at any
  * input rate.
  */
object Drift {

  /** Windowed per-column stats in long form:
    * `(window_start, window_end, column_name, col_min, col_max, col_avg, n)`.
    */
  def windowedProfile(df: DataFrame, cols: Seq[String], tsCol: String = "ts",
                      windowLen: String = "1 minute",
                      watermark: Option[String] = Some("1 minute")): DataFrame = {
    val marked = watermark.fold(df)(df.withWatermark(tsCol, _))
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      val d = col(c).cast("double")
      Seq(min(d).as(s"_${i}_min"), max(d).as(s"_${i}_max"),
        avg(d).as(s"_${i}_avg"), count(col(c)).as(s"_${i}_n"))
    }
    val wide = marked.groupBy(window(col(tsCol), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"),
        col(s"_${i}_min").as("col_min"), col(s"_${i}_max").as("col_max"),
        col(s"_${i}_avg").as("col_avg"), col(s"_${i}_n").as("n"))
    }
    wide.select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), explode(array(rows: _*)).as("p"))
      .select("window_start", "window_end", "p.*")
  }

  /** Streaming PSI: one Population-Stability-Index row per tumbling window
    * against a FIXED baseline histogram — the distributional upgrade of the
    * min/max monitor, sharing the batch [[graft.profile.Psi]] arithmetic
    * (clamped config bins, Laplace smoothing, per-term micro-unit rounding
    * and exact integer summation).
    *
    * `baselineCounts` is the profiled baseline's per-bin counts (from
    * [[graft.profile.Psi.binnedCounts]], ≤ nBins rows — configuration-sized,
    * carried as literals). The windowed histogram is ONE stateful aggregate
    * (nBins conditional sums per window — state O(nBins × open windows),
    * GC'd by the watermark), so the query stays append-mode legal: no
    * second stateful operator, no join. Emits
    * `(window_start, window_end, psi, n)` when the watermark closes a
    * window.
    */
  def psiWindows(df: DataFrame, valueCol: String, baselineCounts: Seq[Long],
                 lo: Double, hi: Double, tsCol: String = "ts",
                 windowLen: String = "1 minute",
                 watermark: Option[String] = Some("1 minute")): DataFrame = {
    val nBins = baselineCounts.size
    require(nBins >= 1 && hi > lo)
    val marked = watermark.fold(df)(df.withWatermark(tsCol, _))
    val bin = graft.profile.Psi.bin(col(valueCol), lo, hi, nBins)
    val binCounts = (0 until nBins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"_b$i"))
    val agg = marked
      .where(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen))
      .agg(binCounts.head, binCounts.tail: _*)
    val totB = baselineCounts.sum
    val totC = (0 until nBins).map(i => col(s"_b$i")).reduce(_ + _)
    val termsMicros = (0 until nBins).map { i =>
      val p = lit((baselineCounts(i) + 0.5) / (totB + nBins * 0.5))
      val q = (col(s"_b$i") + 0.5) / (totC.cast("double") + nBins * 0.5)
      floor((p - q) * log(p / q) * 1e6 + lit(0.5)).cast("long")
    }
    agg.select(col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      (termsMicros.reduce(_ + _).cast("double") / 1e6).as("psi"),
      totC.cast("long").as("n"))
  }

  /** Drift alerts against baseline bounds: one row per (window, column,
    * kind) where the window's observed min/max escapes the baseline range
    * widened by `tolerance` (fraction of the baseline span).
    */
  def alerts(profile: DataFrame, bounds: Map[String, FieldBounds],
             tolerance: Double = 0.0): DataFrame = {
    val checks = bounds.toSeq.sortBy(_._1).flatMap { case (c, fb) =>
      val span = for (lo <- fb.min; hi <- fb.max) yield hi - lo
      val slack = span.map(_ * tolerance).getOrElse(0.0)
      val isCol = col("column_name") === c
      fb.min.map(lo => (isCol && col("col_min") < lo - slack,
        c, "drift_low", lit(lo))).toSeq ++
        fb.max.map(hi => (isCol && col("col_max") > hi + slack,
          c, "drift_high", lit(hi))).toSeq
    }
    checks.map { case (cond, c, kind, bound) =>
      profile.where(cond).select(
        col("window_start"), col("window_end"),
        lit(c).as("column_name"), lit(kind).as("kind"),
        bound.cast("double").as("baseline"),
        when(lit(kind) === "drift_low", col("col_min"))
          .otherwise(col("col_max")).as("observed"))
    }.reduceOption(_ unionAll _)
      .getOrElse(profile.sparkSession.emptyDataFrame)
  }
}
