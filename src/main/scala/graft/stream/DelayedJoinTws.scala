package graft.stream

import graft.core.JoinedDecision
import graft.stream.DelayedJoin.{Config, In, State}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The delayed join (reference: join-service/app/main.py:59-96) on Spark 4's
  * state-v2 `transformWithState` engine — the operator Spark positions as
  * the long-term replacement for `flatMapGroupsWithState`.
  *
  * Both engines run the SAME pure transition, [[DelayedJoin.advance]]; this
  * file is only the state plumbing, so the J1–J7 semantics cannot drift
  * between them. What state-v2 buys at scale:
  *
  *  - **Composite state**: decisions and rewards live in separate
  *    `ListState` handles with per-element RocksDB keys, so appending one
  *    reward to a hot key is O(1) — it does not rewrite the whole buffered
  *    window the way fMGWS's single-value state does.
  *  - **Native timers** replace the one-timeout-per-key limit: the earliest
  *    pending decision deadline is a real timer the store fires, and
  *    re-registering is a keyed store write, not a full state rewrite.
  *  - RocksDB + changelog checkpointing keep per-key state off-heap and
  *    incremental — the right posture for 10⁸ live keys on a 1000-executor
  *    cluster.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` (Spark enforces it for this
  * operator). The two engines' checkpoints are NOT interchangeable —
  * callers flip [[DelayedJoin.Config.useTransformWithState]] only with a
  * fresh checkpoint, which is why fMGWS stays the default.
  */
object DelayedJoinTws {

  /** State-v2 processor: per-key ListState for the buffered window, a
    * ValueState flag for the override tombstone, and one event-time timer
    * at the next wake-up [[DelayedJoin.advance]] asks for.
    */
  private final class Processor(cfg: Config)
      extends StatefulProcessor[String, In, JoinedDecision] {

    @transient private var decisions: ListState[In] = _
    @transient private var rewards: ListState[In] = _
    @transient private var overridden: ValueState[Boolean] = _
    @transient private var wakeUp: ValueState[Long] = _ // the registered timer

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val inEnc = Encoders.product[In]
      decisions = getHandle.getListState[In]("decisions", inEnc, TTLConfig.NONE)
      rewards = getHandle.getListState[In]("rewards", inEnc, TTLConfig.NONE)
      overridden = getHandle.getValueState[Boolean]("overridden",
        Encoders.scalaBoolean, TTLConfig.NONE)
      wakeUp = getHandle.getValueState[Long]("wakeUp",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def readState(): State = State(
      if (decisions.exists()) decisions.get().toList else Nil,
      if (rewards.exists()) rewards.get().toList else Nil,
      overridden.exists() && overridden.get())

    /** Persist `next` and move the single registered timer to `at`.
      * `expiredAt` carries the just-fired timer's timestamp (already
      * removed by the engine, so it must not be re-deleted).
      */
    private def writeState(next: Option[State], at: Long,
        expiredAt: Option[Long]): Unit = {
      val prevTimer =
        if (wakeUp.exists()) Some(wakeUp.get()).filterNot(expiredAt.contains)
        else None
      next match {
        case None =>
          decisions.clear(); rewards.clear(); overridden.clear()
          prevTimer.foreach(getHandle.deleteTimer)
          wakeUp.clear()
        case Some(st) =>
          if (st.decisions.nonEmpty) decisions.put(st.decisions.toArray)
          else decisions.clear()
          if (st.rewards.nonEmpty) rewards.put(st.rewards.toArray)
          else rewards.clear()
          if (st.overridden) overridden.update(true) else overridden.clear()
          if (!prevTimer.contains(at)) {
            prevTimer.foreach(getHandle.deleteTimer)
            getHandle.registerTimer(at)
          }
          wakeUp.update(at)
      }
    }

    override def handleInputRows(key: String, rows: Iterator[In],
        timerValues: TimerValues): Iterator[JoinedDecision] = {
      val incoming = rows.toList
      val prev = readState()
      val (out, next, at) = DelayedJoin.advance(cfg, prev, incoming,
        timerValues.getCurrentWatermarkInMs())
      next match {
        // Fast path: nothing emitted or GC'd — advance only appended the
        // incoming rows (it removes, never reorders, so equal lengths mean
        // equal lists). Append per-element instead of rewriting the window,
        // the state-v2 win for hot keys.
        case Some(st)
            if out.isEmpty && !st.overridden &&
              st.decisions.lengthCompare(prev.decisions.length +
                incoming.count(_.kind == 0)) == 0 &&
              st.rewards.lengthCompare(prev.rewards.length +
                incoming.count(_.kind == 1)) == 0 =>
          val newD = incoming.filter(_.kind == 0)
          val newR = incoming.filter(_.kind == 1)
          if (newD.nonEmpty) decisions.appendList(newD.toArray)
          if (newR.nonEmpty) rewards.appendList(newR.toArray)
          val prevTimer = if (wakeUp.exists()) Some(wakeUp.get()) else None
          if (!prevTimer.contains(at)) {
            prevTimer.foreach(getHandle.deleteTimer)
            getHandle.registerTimer(at)
            wakeUp.update(at)
          }
        case _ => writeState(next, at, expiredAt = None)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[JoinedDecision] = {
      val (out, next, at) = DelayedJoin.advance(cfg, readState(), Nil,
        timerValues.getCurrentWatermarkInMs())
      writeState(next, at, expiredAt = Some(expiredTimerInfo.getExpiryTimeInMs()))
      out.iterator
    }
  }

  /** state-v2 wiring of the delayed join. `input` must already carry the
    * watermarked `ts` event-time column ([[DelayedJoin.joined]] adds it and
    * dispatches here on `cfg.useTransformWithState`).
    */
  def joined(input: Dataset[In], cfg: Config): Dataset[JoinedDecision] =
    input
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(cfg), TimeMode.EventTime(),
        OutputMode.Append())(Encoders.product[JoinedDecision])
}
