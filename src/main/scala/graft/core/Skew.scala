package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salting for hot keys.
  *
  * AQE's skew-join split (enabled by GraftSession) handles most runtime
  * skew; explicit salting is for the pathological case — a handful of keys
  * holding a double-digit percentage of rows (e.g. one `user_id` with 10⁹
  * events at 100 TB) where even a split partition of one key overwhelms an
  * executor. The left (large) side is split into `salt` sub-keys; the right
  * side is replicated `salt` times, so the hot key's rows spread across
  * `salt` tasks.
  */
object Skew {

  /** Equi-join `left` (large, possibly skewed) with `right` (smaller) on
    * `key`, spreading every left key over `salt` partitions. Inner and
    * left-outer supported (semantics identical to the unsalted join).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"unsupported salted join type $joinType")
    // Salt must be a STABLE function of the row position: rand() is
    // per-partition deterministic but row→salt changes under task retry,
    // which can double- or drop-count left rows mid-retry. Hashing the row's
    // COLUMNS is stable but fails on both counts salting cares about: it
    // can't hash map-typed columns at all, and bit-identical rows of one hot
    // key (the exact case salting targets) all collapse onto a single salt.
    // monotonically_increasing_id is position-based — it round-robins even
    // identical rows across all `salt` sub-keys and is recomputed
    // identically on task retry (Spark keeps shuffle/repartition outputs
    // deterministic for exactly this reason).
    val saltedLeft = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-n heavy-hitter keys with counts — the diagnostic used to decide
    * whether salting is warranted. One partial-aggregated shuffle, then
    * `ORDER BY … LIMIT` plans as TakeOrderedAndProject (per-partition heaps,
    * no global sort). Count ties break by key, so the boundary of the top-n
    * is deterministic across runs and engines.
    */
  def heavyHitters(df: DataFrame, key: Column, n: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(n)
}
