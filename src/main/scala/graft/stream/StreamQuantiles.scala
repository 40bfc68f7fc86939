package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming quantile-register maintenance — the live twin of the batch
  * binned sketch ([[graft.analytics.Sketches.quantileRegisters]]): the
  * stream bins each value with the SAME rule and keeps one running count
  * per (group, bin).
  *
  * State posture: BOUNDED BY CONSTRUCTION — ≤ nBins longs per live group,
  * independent of event rate, so no watermark/TTL is needed (state grows
  * with group cardinality only, the same property that lets the batch
  * sketch scale to a 100 TB column). Because bin counts ADD, the streaming
  * state after any number of micro-batches is bit-exactly the one-shot
  * batch registers over the same rows (the merge theorem the incremental
  * store gate pins) — so every readout through
  * [[graft.analytics.Sketches.quantileEstimate]] agrees too, which the
  * parity spec asserts.
  */
object StreamQuantiles {

  /** Streaming register relation `(groupCol, bin, cnt)`; run with
    * `complete` (small dashboards) or `update` (incremental sink) output
    * mode and read out with `Sketches.quantileEstimate`.
    */
  def registers(stream: DataFrame, groupCol: String, value: Column,
                lo: Double, hi: Double, nBins: Int): DataFrame =
    stream.where(value.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol),
        graft.analytics.Sketches.quantileBin(value, lo, hi, nBins).as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("cnt"))
}
