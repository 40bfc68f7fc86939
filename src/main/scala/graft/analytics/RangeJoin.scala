package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each left "point" row to the right
  * "interval" rows containing it — with NO equi key. Spark has no native
  * range-join operator, and the naive formulation
  * `left.join(right, point >= start && point < end)` plans a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
  * in a broadcast): O(|L|·|R|) comparisons, dead at scale.
  *
  * This operator manufactures the missing equi key: time is cut into
  * fixed-width buckets, each interval is exploded to every bucket it
  * overlaps, each point carries the single bucket it falls in, and the join
  * becomes a hash equi-join ON THE BUCKET with the range check as a cheap
  * residual predicate. Properties that make it the 100 TB shape:
  *
  *  - the only shuffle is hash-partitioned by bucket — never a nested loop;
  *  - duplicate-free by construction: a point lives in exactly one bucket,
  *    so each (point, interval) pair meets exactly once — no post-join
  *    dedup shuffle;
  *  - the explode factor is `interval length / bucketWidth + 1`, a
  *    caller-controlled constant (pick the bucket near the typical interval
  *    length); skewed buckets are ordinary join skew, handled by AQE.
  *
  * The same decomposition under an additional equi key is the delayed-join
  * family (`DelayedJoin.batch`); as-of semantics ("latest at or before")
  * are `AsOfJoin.asOf` — this operator is the keyless containment join that
  * completes the family.
  */
object RangeJoin {

  /** `left` points (`pointCol`, numeric, e.g. epoch ms) ⋈ `right` intervals
    * [`startCol`, `endCol`) — end exclusive. Output: every left row paired
    * with every containing interval, all columns of both sides; `joinType`
    * "inner" or "left_outer" (unmatched points keep NULL interval columns).
    * Column names must be disjoint between the two sides.
    */
  def byBucket(left: DataFrame, pointCol: String, right: DataFrame,
               startCol: String, endCol: String, bucketWidth: Long,
               joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported joinType $joinType")
    val lb = left.withColumn("_l_bk", floor(col(pointCol) / bucketWidth).cast("long"))
    // end is exclusive: an interval touching a bucket only at its first
    // instant still overlaps it, hence (end - 1) for the last bucket
    val rb = right.withColumn("_r_bk",
      explode(sequence(floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    lb.join(rb,
        lb("_l_bk") === rb("_r_bk") &&
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol),
        joinType)
      .drop("_l_bk", "_r_bk")
  }
}
