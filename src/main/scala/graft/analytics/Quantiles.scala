package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact NTILE without a global single-partition sort.
  *
  * `Window.orderBy(value)` (no partitionBy) plans a WindowExec whose
  * required child distribution is ALL rows in ONE partition — a
  * single-task global sort that is the canonical 100 TB scale-killer.
  * This operator computes the identical bucket assignment by decomposing
  * the global rank:
  *
  *   rank(row) = (# rows with value < v)  +  row_number within the v-group
  *
  * with three fully-keyed stages:
  *
  *  1. `row_number` within each distinct value, ordered by the tie column —
  *     a window PARTITIONED by value (partition size = duplicates per exact
  *     value, irreducible work for tie-breaking);
  *  2. per-value counts aggregated, then a cumulative sum over the
  *     per-value relation windowed WITHIN a coarse value range (bucket
  *     width fixed by the value domain, so the window partition holds at
  *     most `domain/width` DISTINCT values — domain-bounded, not
  *     data-bounded);
  *  3. coarse-range prefix totals via a broadcast triangular self-join of
  *     the (tiny, ≤ domain/width rows) range aggregate — no window at all.
  *
  * The NTILE bucket then follows from SQL's definition: with N rows and n
  * buckets, q = N div n and r = N mod n, the first r buckets hold q+1 rows.
  */
object Quantiles {

  /** NTILE(n) over ORDER BY (valueCol, tieCol), as a new LONG column
    * `bucketCol`. `coarseWidth` is the value-range width of the stage-2
    * window partitions — pick it so `(max-min)/coarseWidth` is O(100–1000)
    * for the column's DOMAIN (not its row count).
    * (valueCol, tieCol) must be a total order (tieCol unique per value) and
    * non-null, the same contract as a deterministic NTILE.
    */
  def exactNtile(df: DataFrame, valueCol: String, tieCol: String, n: Int,
                 coarseWidth: Double, bucketCol: String = "bucket"): DataFrame = {
    require(n >= 1 && coarseWidth > 0)
    val v = col(valueCol)
    def coarse(c: Column): Column = floor(c / coarseWidth).cast("long")

    // stage 2: distinct-value counts + exclusive cumulative count within the
    // coarse range (window partition ≤ distinct values per range)
    val perVal = df.groupBy(v.as("_v")).agg(count(lit(1)).as("_c"))
      .withColumn("_cr", coarse(col("_v")))
    val wRange = Window.partitionBy("_cr").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val valPrefix = perVal.withColumn("_pv",
      coalesce(sum(col("_c")).over(wRange), lit(0L)))

    // stage 3: exclusive prefix totals per coarse range — triangular
    // broadcast join over the range aggregate (≤ domain/width rows)
    val rangeTotals = perVal.groupBy(col("_cr")).agg(sum(col("_c")).as("_rc"))
    val rangePrefix = rangeTotals.alias("x")
      .join(broadcast(rangeTotals.alias("y")), col("y._cr") < col("x._cr"), "left")
      .groupBy(col("x._cr").as("_cr"))
      .agg(coalesce(sum(col("y._rc")), lit(0L)).as("_pr"))

    val before = valPrefix.join(rangePrefix, "_cr")
      .select(col("_v"), (col("_pv") + col("_pr")).as("_before"))

    val total = df.agg(count(lit(1)).as("_n"))

    // stage 1: rank within the exact-value group (keyed window), then the
    // global 0-based index and the NTILE closed form
    val wTie = Window.partitionBy(valueCol).orderBy(tieCol)
    val q = floor(col("_n") / n).cast("long")
    val r = col("_n") - q * n
    val idx = col("_before") + col("_rw") - 1
    df.withColumn("_rw", row_number().over(wTie).cast("long"))
      .join(before, df(valueCol) === col("_v"))
      .crossJoin(broadcast(total))
      .withColumn(bucketCol,
        when(idx < r * (q + 1), floor(idx / (q + 1)).cast("long"))
          .otherwise(r + floor((idx - r * (q + 1)) / q).cast("long")) + 1)
      .drop("_v", "_rw", "_before", "_n")
  }
}
