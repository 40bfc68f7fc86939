package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The data-quality alert feed (reference: dataops — Prometheus rule
  * `increase(validation_checks_total{loc=…}[1m]) > 0`, generated at
  * dataops/app/profile.py:61-78): per-(loc,type) violation counts over
  * tumbling event-time windows, emitting only windows with at least one
  * violation.
  *
  * Works identically on a streaming violations DataFrame (with watermark,
  * append-mode emission on window close — alert latency ≤ window + watermark,
  * matching the reference's ≤ ~1 min envelope) and on a batch violations
  * DataFrame (backfill/audit).
  */
object DqAlerts {

  /** `violations` must carry (ts: TimestampType, loc, type). */
  def alertCounts(violations: DataFrame, windowLen: String = "1 minute",
                  watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(violations)(violations.withWatermark("ts", _))
    src.groupBy(window(col("ts"), windowLen), col("loc"), col("type"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 0)
      .select(col("window.start").as("window_start"), col("loc"), col("type"), col("n"))
  }
}
