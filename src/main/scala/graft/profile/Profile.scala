package graft.profile

import graft.core.FieldBounds
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the SUMMARIZE analog (reference: dataops/app/profile.py:
  * 44-48 runs DuckDB `SUMMARIZE`; :21-39 consumes column_type, min, max,
  * null_percentage into generated contract bounds).
  *
  * One pass, one wide aggregate over all requested columns, then a pivot to
  * SUMMARIZE's one-row-per-column shape. No per-column scans: profiling a
  * 100 TB table is a single scan + single-partition reduce of a few hundred
  * aggregate values.
  *
  * `exact = false` (default, the at-scale mode) uses approx_count_distinct
  * (HLL++, DuckDB's approx_unique analog) and percentile_approx;
  * `exact = true` uses count_distinct and exact interpolated percentiles —
  * used by the oracle-checked query so the result is engine-independent.
  */
object Profile {

  final case class ColumnProfile(column_name: String, col_min: Double,
      col_max: Double, col_avg: Double, q25: Double, q50: Double, q75: Double,
      col_cnt: Long, null_cnt: Long, n_distinct: Long)

  /** Profile `cols` (numeric) of `df`: one output row per column with
    * min/max/avg/quartiles/count/null count/distinct count.
    */
  def summarize(df: DataFrame, cols: Seq[String], exact: Boolean = false,
                avgScale: Int = 4): DataFrame = {
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      val d = col(c).cast("double")
      val pct =
        if (exact) expr(s"percentile(`$c`, array(0.25, 0.5, 0.75))")
        else percentile_approx(d, array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
      val nd = if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        min(d).as(s"_${i}_min"),
        max(d).as(s"_${i}_max"),
        graft.functions.Rounding.dround(avg(d), avgScale).as(s"_${i}_avg"),
        pct.as(s"_${i}_q"),
        count(col(c)).as(s"_${i}_cnt"),
        count(when(col(c).isNull, 1)).as(s"_${i}_null"),
        nd.as(s"_${i}_nd"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col(s"_${i}_min").as("col_min"),
        col(s"_${i}_max").as("col_max"),
        col(s"_${i}_avg").as("col_avg"),
        graft.functions.Rounding.dround(element_at(col(s"_${i}_q"), 1).cast("double"), avgScale).as("q25"),
        graft.functions.Rounding.dround(element_at(col(s"_${i}_q"), 2).cast("double"), avgScale).as("q50"),
        graft.functions.Rounding.dround(element_at(col(s"_${i}_q"), 3).cast("double"), avgScale).as("q75"),
        col(s"_${i}_cnt").as("col_cnt"),
        col(s"_${i}_null").as("null_cnt"),
        col(s"_${i}_nd").as("n_distinct"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** P2: profile → contract constraints (reference: profile.py:21-39 —
    * min/max become JSON-Schema minimum/maximum; null_percentage == 0 makes
    * the field required). Collect is safe: one row per profiled column.
    */
  def toBounds(profile: DataFrame): (Map[String, FieldBounds], Seq[String]) = {
    val rows = profile.select("column_name", "col_min", "col_max", "null_cnt").collect()
    val bounds = rows.map { r =>
      r.getString(0) -> FieldBounds(Some(r.getDouble(1)), Some(r.getDouble(2)))
    }.toMap
    val required = rows.filter(_.getLong(3) == 0L).map(_.getString(0)).toSeq
    (bounds, required)
  }
}
