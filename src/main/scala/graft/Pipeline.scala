package graft

import graft.core.{Tables, Validation}
import graft.llm.{Dedup, Similarity, TextStats}
import graft.profile.Profile
import graft.stream.{DqAlerts, DqCounters}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end pipeline demo: one `runMain graft.Pipeline [sfDir] [outDir]`
  * exercises the full engine story the way a user of the reference would —
  * ingest+validate → silver parquet → profile → generated bounds →
  * violation counters + alert windows → corpus dedup → similarity — and
  * prints a one-line summary per stage.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dq = new DqCounters.Listener("dq")
    spark.listenerManager.register(dq)

    // 1. ingest: events.props is the raw JSON log; validate + split
    val ev = Tables(spark, sfDir, "events")
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
    val rules = Seq("event_id", "user_id", "k").map(f =>
      Validation.Rule(f, "missing", col(f).isNull))
    // observe-metrics fire once per action (like Prometheus counters); the
    // silver write is the single counted pass
    val (valid, _) = Validation.split(DqCounters.observed(ev, rules), rules)
    valid.drop("_violations").write.mode("overwrite").parquet(s"$outDir/events_silver")
    val (_, invalid) = Validation.split(ev, rules)
    println(s"[pipeline] ingest: ${spark.read.parquet(s"$outDir/events_silver").count()} valid, " +
      s"${invalid.count()} quarantined")

    // 2. profile the silver table → generated bounds → next-batch validation
    val silver = spark.read.parquet(s"$outDir/events_silver")
    val prof = Profile.summarize(silver, Seq("value", "k"), exact = true)
    val (bounds, required) = Profile.toBounds(prof)
    println(s"[pipeline] profile: bounds=${bounds.keys.toSeq.sorted.mkString(",")} required=${required.sorted.mkString(",")}")
    val nextRules = Validation.boundsRules(bounds)
    val alerts = DqAlerts.alertCounts(
      Validation.violations(silver.withColumn("value", col("value") * 2), nextRules)
        .crossJoin(silver.select(col("ts")).limit(1))) // synthetic ts for demo
    println(s"[pipeline] dq: ${alerts.count()} alert windows from drifted batch")

    // 3. corpus ops over documents
    val docs = Tables(spark, sfDir, "documents")
    val nExact = Dedup.exact(docs).where(col("n_dups") > 1).count()
    val nNear = Dedup.minhash(docs).count()
    val stats = TextStats.langStats(docs).count()
    println(s"[pipeline] dedup: $nExact exact groups, $nNear near-dup pairs; $stats langs")

    // 4. similarity over embeddings
    val embs = Tables(spark, sfDir, "embeddings")
    val q = embs.orderBy("vec_id").limit(1).select(col("embedding").as("qvec"))
    val top = Similarity.topK(embs, q, 5).collect()
    println(s"[pipeline] similarity: top-5 of query vec -> ${top.map(_.getLong(0)).mkString(",")}")
    println(s"[pipeline] counters:\n${dq.renderPrometheus()}")
    spark.stop()
  }
}
