package graft

import graft.stream.DelayedJoin
import graft.stream.DelayedJoin.{Config, In}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Cross-restart sink buffer for the TWS checkpoint-recovery test (same
  * JVM-global pattern as [[RecoveredRows]] — a restarted query must not
  * re-capture a test-local).
  */
object TwsRecoveredRows {
  val buf = scala.collection.mutable.ArrayBuffer[(String, Double)]()
}

/** J1–J7 on the Spark 4 state-v2 `transformWithState` engine
  * ([[graft.stream.DelayedJoinTws]]): the same fixture scenarios as
  * [[DelayedJoinSpec]], an event-for-event parity run against the default
  * flatMapGroupsWithState engine, and checkpoint recovery through the
  * RocksDB state store. Δ = 10 000 ms.
  */
class DelayedJoinTwsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1000000L
  private val Delta = 10000L
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** transformWithState requires the RocksDB provider; scope it to the
    * queries each test starts and restore the session default after.
    */
  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def run(cfg: Config, events: Seq[In], name: String): Seq[(String, Double, Option[Long])] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[In]
      val q: StreamingQuery = DelayedJoin.joined(spark, input.toDS(), cfg)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(events: _*)
        q.processAllAvailable()
        input.addData(In.apply(graft.core.Reward("_wm", 0.0, T0 + 30 * Delta)))
        q.processAllAvailable()
        input.addData(In.apply(graft.core.Reward("_wm", 0.0, T0 + 31 * Delta)))
        q.processAllAvailable()
        spark.table(name)
          .select("key", "reward", "reward_delta_ms")
          .as[(String, Double, Option[Long])].collect().toSeq.sorted
      } finally q.stop()
    }

  private def d(key: String, ms: Long) =
    In(graft.core.Decision(key, "ctx", "act", 0.5, ms))
  private def r(key: String, ms: Long, v: Double) =
    In(graft.core.Reward(key, v, ms))

  private val twsCfg = Config(deltaMs = Delta, useTransformWithState = true)

  test("tws: delayed join core semantics J1-J5") {
    val out = run(twsCfg, Seq(
      d("k1", T0), r("k1", T0 + 3000, 5.0),          // reward in window
      d("k2", T0),                                    // no reward -> 0.0
      d("k3", T0), r("k3", T0 + 1000, 1.0), r("k3", T0 + 2000, 2.0), // fan-out
      r("k4", T0, 1.0), d("k4", T0 + 2000),           // reward BEFORE decision
      d("k5", T0), r("k5", T0 + 11000, 9.0)           // reward after window
    ), "tws_core")
    assert(out == Seq(
      ("k1", 5.0, Some(3000L)),
      ("k2", 0.0, None),
      ("k3", 1.0, Some(1000L)),
      ("k3", 2.0, Some(2000L)),
      ("k4", 0.0, None),
      ("k5", 0.0, None)))
  }

  test("tws: last-reward-wins variant J6 emits exactly one row per decision") {
    val out = run(twsCfg.copy(lastRewardWins = true), Seq(
      d("k3", T0), r("k3", T0 + 1000, 1.0), r("k3", T0 + 2000, 2.0),
      d("k2", T0)
    ), "tws_lastwins")
    assert(out == Seq(("k2", 0.0, None), ("k3", 2.0, Some(2000L))))
  }

  test("tws: override tombstone J7 suppresses the decision") {
    val out = run(twsCfg.copy(honorOverrides = true), Seq(
      d("k6", T0), In.overrideKey("k6", T0 + 1000),
      d("k7", T0)
    ), "tws_override")
    assert(out == Seq(("k7", 0.0, None)))
  }

  test("tws: reward survives interleaved same-key steps until the deadline") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[In]
      val q = DelayedJoin.joined(spark, input.toDS(), twsCfg)
        .writeStream.format("memory").queryName("tws_gc").outputMode("append").start()
      try {
        input.addData(d("g1", T0), r("g1", T0 + 3000, 5.0))
        q.processAllAvailable()
        // a same-key reward forces an input step (the append fast path)
        // while the decision is pending; the buffered reward must survive
        input.addData(r("g1", T0 + 7000, 9.9), r("_wm", T0 + 7000, 0.0))
        q.processAllAvailable()
        input.addData(r("_wm", T0 + 30 * Delta, 0.0))
        q.processAllAvailable()
        input.addData(r("_wm", T0 + 31 * Delta, 0.0))
        q.processAllAvailable()
        val out = spark.table("tws_gc").where($"key" === "g1")
          .select("key", "reward", "reward_delta_ms")
          .as[(String, Double, Option[Long])].collect().toSeq.sorted
        assert(out == Seq(("g1", 5.0, Some(3000L)), ("g1", 9.9, Some(7000L))))
      } finally q.stop()
    }
  }

  test("tws: engine parity — identical output to flatMapGroupsWithState") {
    // One interleaved scenario exercising fan-out, miss-default, window
    // boundary, GC revisit and volume; both engines must agree row for row.
    val events = Seq(
      d("p1", T0), r("p1", T0 + 1000, 1.0), r("p1", T0 + Delta, 2.0),
      r("p1", T0 + Delta + 1, 3.0),          // boundary: +Δ in, +Δ+1 out
      d("p2", T0 + 5000),                    // miss -> 0.0
      d("p3", T0), d("p3", T0 + 2000), r("p3", T0 + 2500, 7.0) // 2 decisions
    ) ++ (0 until 50).flatMap(k =>
      Seq(d(s"v$k", T0 + k), r(s"v$k", T0 + k + 500, k.toDouble)))
    val fmgws = run(Config(deltaMs = Delta), events, "par_fmgws")
    val tws = run(twsCfg, events, "par_tws")
    assert(tws == fmgws)
    assert(tws.count(_._1 == "p1") == 2) // both in-window rewards fan out
  }

  test("tws: volume — 500 keys x 20 events through the state-v2 machine") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[In]
      val q = DelayedJoin.joined(spark, input.toDS(), twsCfg)
        .writeStream.format("memory").queryName("tws_volume").outputMode("append").start()
      try {
        // per key: one decision + 19 rewards, only +7000 inside [0, Δ] —
        // the rewards land in separate batches, exercising the append
        // fast path against buffered state
        val events = (0 until 500).flatMap { k =>
          d(s"u$k", T0) +: (1 to 19).map(i =>
            r(s"u$k", T0 + i * 7000L, i.toDouble))
        }
        events.grouped(2000).foreach { chunk => input.addData(chunk: _*) }
        q.processAllAvailable()
        input.addData(r("_wm", T0 + 100 * Delta, 0.0))
        q.processAllAvailable()
        input.addData(r("_wm", T0 + 101 * Delta, 0.0))
        q.processAllAvailable()
        val out = spark.table("tws_volume")
        assert(out.where($"key" =!= "_wm").count() == 500)
        assert(out.where($"reward" === 1.0).count() == 500)
      } finally q.stop()
    }
  }

  test("tws: state survives a query restart from checkpoint (RocksDB)") {
    withRocksDb {
      val srcDir = tmpDir("twssrc")
      val ckpt = tmpDir("twsckpt")
      val schema = org.apache.spark.sql.Encoders.product[In].schema
      def writeBatch(events: Seq[In]): Unit =
        events.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      def startQuery() = DelayedJoin.joined(spark,
          spark.readStream.schema(schema).parquet(srcDir).as[In], twsCfg)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.core.JoinedDecision], _: Long) =>
          val rows = batch.collect().map(j => (j.key, j.reward))
          TwsRecoveredRows.synchronized { TwsRecoveredRows.buf ++= rows }
          ()
        }.start()

      // run 1: buffer a decision+reward, stop BEFORE the window closes
      writeBatch(Seq(d("rk1", T0), r("rk1", T0 + 2000, 3.5)))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      assert(TwsRecoveredRows.synchronized(TwsRecoveredRows.buf.isEmpty))

      // run 2: fresh query, same checkpoint — the buffered state (lists,
      // flag, timer) must come back from the RocksDB store
      writeBatch(Seq(r("_wm", T0 + 30 * Delta, 0.0)))
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        writeBatch(Seq(r("_wm", T0 + 31 * Delta, 0.0)))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(TwsRecoveredRows.synchronized(TwsRecoveredRows.buf.toSet) ==
        Set(("rk1", 3.5)))
    }
  }

  test("streaming heavy hitters: promotion at threshold, milestone cadence") {
    import graft.stream.{HeavyHit, StreamHeavyHitters}
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[String]
      val q = StreamHeavyHitters.hits(input.toDS(), threshold = 3L, every = 2L)
        .writeStream.format("memory").queryName("shh")
        .outputMode("append").start()
      try {
        // batch 1: a×2, b×1 — nobody reaches the threshold
        input.addData("a", "b", "a")
        q.processAllAvailable()
        assert(spark.table("shh").as[HeavyHit].collect().isEmpty)
        // batch 2: a crosses 3 (promoted), then milestones at 5;
        // b stays cold at 2
        input.addData("a", "a", "a", "b")
        q.processAllAvailable()
        assert(spark.table("shh").as[HeavyHit].collect().toSet ==
          Set(HeavyHit("a", 3L), HeavyHit("a", 5L)))
        // batch 3: counter state persists across batches — a hits the
        // 7-milestone with two more events; b finally promotes at 3
        input.addData("a", "a", "b")
        q.processAllAvailable()
        assert(spark.table("shh").as[HeavyHit].collect().toSet ==
          Set(HeavyHit("a", 3L), HeavyHit("a", 5L), HeavyHit("a", 7L),
            HeavyHit("b", 3L)))
      } finally q.stop()
    }
  }
}
