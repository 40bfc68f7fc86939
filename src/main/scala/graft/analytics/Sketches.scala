package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based aggregates: bounded-state approximations of the aggregations
  * whose exact forms carry state proportional to data cardinality. Unlike
  * Spark's built-ins (approx_count_distinct's HLL++ over xxhash64) these are
  * deterministic over the engine-agnostic [[graft.functions.PolyHash]]
  * basis, so their results — approximation error included — replay bit for
  * bit in any engine, which keeps them oracle-checkable and makes pipeline
  * re-runs reproducible.
  */
object Sketches {

  /** KMV distinct-count estimate of `idCol` (non-negative LONG) per value of
    * `groupCol`: `(groupCol, est_distinct)`. State is k longs per (group,
    * task) — constant in the data — against exact distinct's
    * one-row-per-distinct-value shuffle; standard error ≈ 1/√(k−2), and
    * groups with fewer than k distinct hashes report the EXACT count.
    */
  def kmvDistinctBy(df: DataFrame, groupCol: String, idCol: String,
                    k: Int = 64, seed: Long = 42L): DataFrame =
    df.groupBy(groupCol).agg(
      graft.functions.native.kmvDistinct(col(idCol), k, seed).as("est_distinct"))
}
