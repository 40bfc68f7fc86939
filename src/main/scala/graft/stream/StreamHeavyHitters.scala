package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** A promoted heavy hitter or a subsequent count milestone for it. */
final case class HeavyHit(item: String, n: Long)

/** Streaming heavy hitters on the state-v2 `transformWithState` engine —
  * the streaming analog of the batch `heavy_hitters` / `heavy_hitters_cms`
  * queries (the DQ monitor that answers "which keys are suddenly hot?"
  * while the stream runs, instead of at the next batch audit).
  *
  * Semantics (append-mode, deterministic per input prefix): a key emits
  * `(item, n)` the moment its running count REACHES `threshold`
  * (promotion), and again at every `every`-th increment after that
  * (milestones) — so downstream sees each hot key once plus a bounded
  * update cadence, never one row per event. Emission depends only on the
  * per-key event count, not on timing, which is what makes the operator
  * exactly testable (and replayable) batch-for-batch.
  *
  * Scale shape: state is ONE long per key (a `ValueState` counter with
  * per-key RocksDB storage — millions of live keys are off-heap and
  * incremental under changelog checkpointing), input is keyed so counting
  * is a map-side-shuffled stream, and the output volume is
  * `hot_keys × (1 + extra/every)` — independent of the event rate.
  * `ttl` (processing-time) expires idle keys' counters, bounding state for
  * open-ended key domains like URLs or session ids.
  */
object StreamHeavyHitters {

  private final class Processor(threshold: Long, every: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, String, HeavyHit] {

    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[String],
        timerValues: TimerValues): Iterator[HeavyHit] = {
      var c = if (n.exists()) n.get() else 0L
      val out = List.newBuilder[HeavyHit]
      rows.foreach { _ =>
        c += 1
        if (c == threshold || (c > threshold && (c - threshold) % every == 0))
          out += HeavyHit(key, c)
      }
      n.update(c)
      out.result().iterator
    }
  }

  /** Wire the operator over a keyed item stream. Requires the RocksDB
    * state-store provider (Spark enforces it for state-v2).
    */
  def hits(items: Dataset[String], threshold: Long = 3L, every: Long = 2L,
           ttl: TTLConfig = TTLConfig.NONE): Dataset[HeavyHit] = {
    require(threshold >= 1 && every >= 1,
      s"threshold/every must be >= 1: $threshold/$every")
    items
      .groupByKey(identity)(Encoders.STRING)
      .transformWithState(new Processor(threshold, every, ttl),
        TimeMode.None(), OutputMode.Append())(Encoders.product[HeavyHit])
  }
}
