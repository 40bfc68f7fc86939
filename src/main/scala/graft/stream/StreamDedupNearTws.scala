package graft.stream

import graft.stream.StreamDedupNear.{Config, Keyed, Match, Owner}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming near-dup on Spark 4's state-v2 `transformWithState` engine —
  * the same dual-engine posture as [[DelayedJoinTws]]: both engines run
  * the SAME pure transition ([[StreamDedupNear.fold]]), this file is only
  * the state plumbing, so the match semantics cannot drift between them.
  *
  * What state-v2 buys here: the per-bucket owner lives in a `ValueState`
  * on RocksDB (off-heap, changelog-checkpointed — the posture for 10⁸
  * occupied buckets on a large cluster), and the horizon GC is a native
  * per-key timer the store fires instead of the fMGWS one-timeout slot.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` (Spark enforces it). Checkpoints
  * are NOT interchangeable with the fMGWS engine — flip
  * `useTransformWithState` only with a fresh checkpoint, which is why
  * fMGWS stays [[StreamDedupNear.matches]]'s default.
  */
object StreamDedupNearTws {

  private final class Processor(cfg: Config, horizonMs: Long)
      extends StatefulProcessor[(Int, Long), Keyed, Match] {

    @transient private var owner: ValueState[Owner] = _
    @transient private var wakeUp: ValueState[Long] = _ // the registered timer

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      owner = getHandle.getValueState[Owner]("owner",
        Encoders.product[Owner], TTLConfig.NONE)
      wakeUp = getHandle.getValueState[Long]("wakeUp",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: (Int, Long), rows: Iterator[Keyed],
        timerValues: TimerValues): Iterator[Match] = {
      val incoming = rows.toList
      if (incoming.isEmpty) return Iterator.empty
      val prev = if (owner.exists()) Some(owner.get()) else None
      val (out, next) = StreamDedupNear.fold(cfg, prev, incoming)
      val o = next.get // incoming non-empty ⇒ an owner exists after fold
      owner.update(o)
      val at = math.max(o.lastMs + horizonMs,
        timerValues.getCurrentWatermarkInMs() + 1)
      val prevTimer = if (wakeUp.exists()) Some(wakeUp.get()) else None
      if (!prevTimer.contains(at)) {
        prevTimer.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(at)
        wakeUp.update(at)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, Long),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Match] = {
      // horizon passed: the bucket owner is stale — GC (the timer that
      // fired was already removed by the engine)
      owner.clear()
      wakeUp.clear()
      Iterator.empty
    }
  }

  /** state-v2 wiring over the shared keyed stream ([[StreamDedupNear
    * .matches]] dispatches here on `useTransformWithState`).
    */
  def matches(keyed: Dataset[Keyed], cfg: Config,
              horizonMs: Long): Dataset[Match] =
    keyed
      .groupByKey(k => (k.band, k.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .transformWithState(new Processor(cfg, horizonMs), TimeMode.EventTime(),
        OutputMode.Append())(Encoders.product[Match])
}
