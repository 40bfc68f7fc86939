package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the warehouse tables (see /root/repo/TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's reader
  * rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it as a raw nanosecond
  * LONG (`spark.sql.legacy.parquet.nanosAsLong`) and normalise to a
  * microsecond TimestampType at the edge, so all engine code sees plain
  * TimestampType. `ts div 1000` truncates exactly like DuckDB's
  * TIMESTAMP_NS→TIMESTAMP cast, keeping oracle comparisons exact.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Guards the opt-in cache() below: cache() is idempotent via the
  // CacheManager's plan-equality lookup, but every repeated call logs an
  // "Asked to cache already cached data" warning — 52 queries × 10 tables
  // of that spam drowned the bench JSON line. One cache() per
  // (session, dir, table) is enough.
  private val cached =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String, String)]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events") raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // Opt-in warehouse cache (spark.graft.cacheTables=true): repeated loads
    // of the same table resolve to one in-memory copy via the CacheManager's
    // plan-equality lookup. For repeated-query workloads over tables that fit
    // executor memory (dims, hot silver tables) — not for the 100 TB fact
    // table, which is why it is off by default.
    if (spark.conf.getOption("spark.graft.cacheTables").contains("true") &&
        cached.add((System.identityHashCode(spark), dir, name))) df.cache()
    else df
  }

  /** Register every warehouse table as a temp view so `spark.sql` queries
    * run against the same canonical loaders.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
