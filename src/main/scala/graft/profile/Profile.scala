package graft.profile

import graft.analytics.Quantiles
import graft.core.FieldBounds
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data profiling — the SUMMARIZE analog (reference: dataops/app/profile.py:
  * 44-48 runs DuckDB `SUMMARIZE`; :21-39 consumes column_type, min, max,
  * null_percentage into generated contract bounds).
  *
  * `exact = false` (the at-scale streaming-friendly mode) is ONE lazy pass:
  * a single wide aggregate with approx_count_distinct (HLL++, DuckDB's
  * approx_unique analog) and percentile_approx.
  *
  * `exact = true` matches DuckDB `quantile_cont` / `count(DISTINCT)` bit for
  * bit and is EAGER, like SUMMARIZE itself: the built-in exact
  * `percentile()` is a `TypedImperativeAggregate` whose buffer holds every
  * distinct (value, count) pair on one final reducer — state ∝ table size, a
  * 100 TB scale-killer. Instead the exact path is TWO bounded jobs over a
  * persisted keyed `groupBy(column, value)` relation (the shuffle state per
  * task is bounded by the value domain, never the row count). NULLs are kept
  * as their own `(column, NULL)` group, so every simple statistic —
  * min/max/avg/count/null-count/distinct-count — derives from the same
  * relation and no separate full-table aggregate pass exists:
  *
  *  1. `(column, value) → count` (map-side combinable keyed shuffle),
  *     persisted; per-column min/max/n/null-count/weighted-avg aggregated
  *     (one row per column, broadcast back for bucketing) and a fixed-width
  *     histogram (≤ cols × 1024 buckets, carrying those stats) collected —
  *     one job. Quartile ranks lo = ⌊q·(n−1)⌋, hi = ⌈q·(n−1)⌉ are located in
  *     their buckets driver-side — pure arithmetic on the bounded histogram;
  *  2. ONLY the hit buckets' distinct values (≈ n_distinct/1024 rows per
  *     bucket) are ranked with a window keyed by (column, bucket), and only
  *     the ≤ 2 bounding rows per quartile are collected and interpolated:
  *     v_lo + (q·(n−1) − lo)·(v_hi − v_lo), DuckDB's quantile_cont.
  *
  * Every collect is bounded by columns × buckets × quantiles — configuration,
  * not data. No full-table state ever reaches the driver or a single task.
  */
object Profile {

  final case class ColumnProfile(column_name: String, col_min: Double,
      col_max: Double, col_avg: Double, q25: Double, q50: Double, q75: Double,
      col_cnt: Long, null_cnt: Long, n_distinct: Long)

  private val Buckets = 1024
  private val Quartiles = Seq(0.25, 0.5, 0.75)

  private val profileSchema = StructType(Seq(
    StructField("column_name", StringType, nullable = false),
    StructField("col_min", DoubleType), StructField("col_max", DoubleType),
    StructField("col_avg", DoubleType), StructField("q25", DoubleType),
    StructField("q50", DoubleType), StructField("q75", DoubleType),
    StructField("col_cnt", LongType), StructField("null_cnt", LongType),
    StructField("n_distinct", LongType)))

  /** Profile `cols` (numeric) of `df`: one output row per column with
    * min/max/avg/quartiles/count/null count/distinct count.
    */
  def summarize(df: DataFrame, cols: Seq[String], exact: Boolean = false,
                avgScale: Int = 4): DataFrame =
    if (exact) summarizeExact(df, cols, avgScale) else summarizeApprox(df, cols, avgScale)

  private def summarizeApprox(df: DataFrame, cols: Seq[String], avgScale: Int): DataFrame = {
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      val d = col(c).cast("double")
      Seq(
        min(d).as(s"_${i}_min"),
        max(d).as(s"_${i}_max"),
        graft.functions.Rounding.dround(avg(d), avgScale).as(s"_${i}_avg"),
        percentile_approx(d, array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
          .as(s"_${i}_q"),
        count(col(c)).as(s"_${i}_cnt"),
        count(when(col(c).isNull, 1)).as(s"_${i}_null"),
        approx_count_distinct(col(c)).as(s"_${i}_nd"))
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

  /** Driver-side replica of [[graft.functions.Rounding.dround]] (binary-value
    * HALF-UP, the formulation DuckDB uses) so eager and lazy paths round
    * identically.
    */
  private def dround(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    if (x >= 0) math.floor(x * p + 0.5) / p else -(math.floor(-x * p + 0.5) / p)
  }

  private def summarizeExact(df: DataFrame, cols: Seq[String], avgScale: Int): DataFrame = {
    // unpivot the requested columns into the (_cn, _v) keyed shape
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    profileKeyed(
      df.select(expr(s"stack(${cols.length}, $stackArgs) AS (_cn, _v)")),
      Some(cols), avgScale)
  }

  /** Grouped exact profile — one profile row PER GROUP VALUE of one numeric
    * column (per-source/per-language SUMMARIZE, the slice diagnostic a
    * corpus pipeline runs before mixing). Identical bounded machinery to
    * the column-wise exact profile, with the group value as the key:
    * per-task state is bounded by each group's value domain. `column_name`
    * carries the group value; NULL groups are dropped (the profile keys on
    * the group name).
    */
  def summarizeBy(df: DataFrame, groupCol: String, valueCol: String,
                  avgScale: Int = 4): DataFrame =
    profileKeyed(
      df.where(col(groupCol).isNotNull)
        .select(col(groupCol).cast("string").as("_cn"),
          col(valueCol).cast("double").as("_v")),
      None, avgScale)

  /** Shared exact-profile core over a pre-keyed `(_cn, _v)` relation.
    * `keys = Some(...)` pins the output rows (column-wise profile, one row
    * per requested column even when empty); `None` derives them from the
    * data (grouped profile, one row per observed group).
    */
  private def profileKeyed(keyed: DataFrame, keys: Option[Seq[String]],
                           avgScale: Int): DataFrame = {
    val spark = keyed.sparkSession

    // The ONE keyed relation everything derives from: (key, value) → count
    // with NULL values kept as their own group (unlike Quantiles.valueCounts,
    // which is quantile-only and drops them). min/max/count/null-count and
    // the count-weighted average all aggregate from it, so there is no
    // separate full-table wide-aggregate pass — the whole profile is this
    // shuffle plus two bounded collects.
    val perVal = keyed
      .groupBy("_cn", "_v").agg(count(lit(1)).as("_c"))
      .persist()
    // One row per column; broadcast back onto perVal for bucketing. The
    // weighted mean Σ(v·c)/Σ(c) sums FEWER terms than a row-order mean (one
    // per distinct value), and the result is rounded to `avgScale` exactly
    // like the lazy path, which absorbs the summation-order ulp.
    val nNonNull = sum(when(col("_v").isNotNull, col("_c")))
    val statsDf = perVal.groupBy("_cn").agg(
      min("_v").as("_mn"), max("_v").as("_mx"),
      coalesce(nNonNull, lit(0L)).as("_n"),
      coalesce(sum(when(col("_v").isNull, col("_c"))), lit(0L)).as("_nulls"),
      graft.functions.Rounding.dround(sum(col("_v") * col("_c")) / nNonNull,
        avgScale).as("_avg"))
    // job 1: materialize perVal and collect the bounded histogram, stats
    // riding along via first(). NULL groups land in sentinel bucket −1: they
    // are excluded from the histogram/quantile arithmetic below but carry the
    // per-column stats for all-NULL columns (which have no other rows). The
    // bucket arithmetic is identical to the driver-literal form the bounding
    // pass rebuilds below, so bucket ids agree bit for bit.
    val width = (col("_mx") - col("_mn")) / Buckets
    val rawHist = perVal.join(broadcast(statsDf), "_cn")
      .withColumn("_cr",
        when(col("_v").isNull, lit(-1L))
          .when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(floor((col("_v") - col("_mn")) / width),
            lit(Buckets - 1L))))
      .groupBy("_cn", "_cr")
      .agg(sum("_c").as("rc"), count(lit(1)).as("ndp"),
        first("_mn").as("mn"), first("_mx").as("mx"), first("_n").as("n"),
        first("_nulls").as("nulls"), first("_avg").as("avgv"))
      .collect()
    final case class ColStats(mn: java.lang.Double, mx: java.lang.Double,
        avg: java.lang.Double, n: Long, nulls: Long)
    val colStats: Map[String, ColStats] = rawHist.map { r =>
      def d(name: String): java.lang.Double =
        if (r.isNullAt(r.fieldIndex(name))) null
        else Double.box(r.getAs[Double](name))
      r.getAs[String]("_cn") -> ColStats(d("mn"), d("mx"), d("avgv"),
        r.getAs[Long]("n"), r.getAs[Long]("nulls"))
    }.toMap
    val outKeys: Seq[String] = keys.getOrElse(colStats.keys.toSeq.sorted)
    val (quartile: Map[String, Map[Double, Double]], nDistinct: Map[String, Long]) =
      try {
        // per-column domain + non-null count for the quantile machinery —
        // real (non-sentinel) histogram rows only
        val stats: Map[String, (Double, Double, Long)] = rawHist
          .filter(_.getAs[Long]("_cr") >= 0L).map { r =>
            r.getAs[String]("_cn") -> ((r.getAs[Double]("mn"), r.getAs[Double]("mx"),
              r.getAs[Long]("n")))
          }.toMap

        // histogram id per distinct value, from driver-side literal stats
        val crExpr: Column = stats.foldLeft(lit(-1L)) { case (acc, (cn, (mn, mx, _))) =>
          val e =
            if (mx == mn) lit(0L)
            else least(floor((col("_v") - mn) / ((mx - mn) / Buckets)), lit(Buckets - 1L))
          when(col("_cn") === cn, e).otherwise(acc)
        }

        val histRows = rawHist.filter(_.getAs[Long]("_cr") >= 0L)
          .map(r => (r.getAs[String]("_cn"),
            r.getAs[Long]("_cr"), r.getAs[Long]("rc"), r.getAs[Long]("ndp")))
        val nd: Map[String, Long] =
          histRows.groupBy(_._1).map { case (cn, rs) => cn -> rs.map(_._4).sum }
        val hist: Map[String, Array[(Long, Long, Long)]] = // cn → (cr, rc, pr)
          histRows.groupBy(_._1)
            .map { case (cn, rs) =>
              val sorted = rs.map(t => (t._2, t._3)).sortBy(_._1)
              val prs = sorted.scanLeft(0L)(_ + _._2)
              cn -> sorted.zip(prs).map { case ((cr, rc), pr) => (cr, rc, pr) }.toArray
            }

        final case class Target(cn: String, q: Double, t: Double, lo: Long, hi: Long)
        val targets = for {
          cn <- outKeys; (_, _, n) <- stats.get(cn).toSeq; q <- Quartiles
        } yield {
          val t = q * (n - 1).toDouble
          Target(cn, q, t, math.floor(t).toLong, math.ceil(t).toLong)
        }
        if (targets.isEmpty) (Map.empty[String, Map[Double, Double]], nd)
        else {

        def bucketOf(cn: String, rank: Long): (Long, Long) = {
          val bs = hist(cn)
          val i = bs.lastIndexWhere(_._3 <= rank)
          (bs(i)._1, bs(i)._3) // (cr, exclusive prefix)
        }
        val hitBuckets: Map[String, Map[Long, Long]] = // cn → cr → pr
          targets.flatMap(t => Seq(t.lo, t.hi).map(bucketOf(t.cn, _)).map(t.cn -> _))
            .groupBy(_._1).map { case (cn, bs) => cn -> bs.map(_._2).toMap }

        // pass 3: rank ONLY the hit buckets' values; collect the bounding rows
        val candFilter = hitBuckets.map { case (cn, crs) =>
          col("_cn") === cn && col("_cr").isin(crs.keys.toSeq: _*)
        }.reduce(_ || _)
        val prCol = hitBuckets.flatMap { case (cn, crs) => crs.map { case (cr, pr) =>
          (cn, cr, pr)
        } }.foldLeft(lit(0L)) { case (acc, (cn, cr, pr)) =>
          when(col("_cn") === cn && col("_cr") === cr, lit(pr)).otherwise(acc)
        }
        val w = Window.partitionBy("_cn", "_cr").orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val rankHit = targets.map(t =>
          col("_cn") === t.cn &&
            ((lit(t.lo) >= col("_before") && lit(t.lo) < col("_before") + col("_c")) ||
             (lit(t.hi) >= col("_before") && lit(t.hi) < col("_before") + col("_c"))))
          .reduce(_ || _)
        val bounding: Map[String, Array[(Double, Long, Long)]] = // cn → (v, before, c)
          perVal.where(col("_v").isNotNull).withColumn("_cr", crExpr).where(candFilter)
            .withColumn("_before", prCol + coalesce(sum("_c").over(w), lit(0L)))
            .where(rankHit)
            .select("_cn", "_v", "_before", "_c").collect()
            .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
            .groupBy(_._1).map { case (cn, rs) =>
              cn -> rs.map(t => (t._2, t._3, t._4)).toArray
            }

        val quarts = targets.groupBy(_.cn).map { case (cn, ts) =>
          def valueAt(rank: Long): Double =
            bounding(cn).find(b => b._2 <= rank && rank < b._2 + b._3).get._1
          cn -> ts.map { t =>
            val (vlo, vhi) = (valueAt(t.lo), valueAt(t.hi))
            t.q -> dround(vlo + (t.t - t.lo) * (vhi - vlo), avgScale)
          }.toMap
        }
        (quarts, nd)
        }
      } finally { perVal.unpersist(); () }

    val out = outKeys.map { c =>
      val st = colStats.get(c)
      val qs = quartile.get(c)
      Row(c, st.map(_.mn).orNull, st.map(_.mx).orNull, st.map(_.avg).orNull,
        qs.map(m => Double.box(m(0.25))).orNull,
        qs.map(m => Double.box(m(0.5))).orNull,
        qs.map(m => Double.box(m(0.75))).orNull,
        st.map(_.n).getOrElse(0L),
        st.map(_.nulls).getOrElse(0L),
        nDistinct.getOrElse(c, 0L))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      profileSchema)
  }

  /** Fixed-width value histogram: `buckets` equal ranges over [min, max]
    * (last bucket closed), returned as `(bucket, cnt)`. The two-row min/max
    * sub-aggregate is broadcast back onto the scan — a lazy single plan,
    * zero unbounded state, the standard distribution diagnostic
    * (doc lengths, score spreads) at any scale. Bucket arithmetic matches
    * the profile/quantile machinery bit for bit, so it is oracle-checkable.
    */
  def histogram(df: DataFrame, c: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1)
    val stats = df.agg(min(col(c)).cast("double").as("_mn"),
      max(col(c)).cast("double").as("_mx"))
    df.select(col(c).cast("double").as("_v")).where(col("_v").isNotNull)
      .crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_mn")) / ((col("_mx") - col("_mn")) / buckets)),
            lit(buckets - 1L))))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Per-group z-score outliers — the statistical quality gate that flags
    * rows whose `valueCol` sits ≥ `zThreshold` standard deviations from the
    * group mean (docs suspiciously long for their language, prices off their
    * brand's distribution). One map-side-combined shuffle for the per-group
    * mean/stddev, broadcast back onto the scan — the corpus itself never
    * shuffles. The aggregates are rounded ONCE (6 dp) before the per-row z,
    * so the z and the filter decision are bit-reproducible across engines
    * and partitionings instead of inheriting the aggregates'
    * summation-order ulp. Returns the input columns plus `z`; groups with
    * zero variance yield no rows.
    */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     zThreshold: Double): DataFrame = {
    val stats = df.groupBy(groupCol).agg(
      graft.functions.Rounding.dround(avg(col(valueCol)), 6).as("_mean"),
      graft.functions.Rounding.dround(stddev_samp(col(valueCol)), 6).as("_std"))
    df.join(broadcast(stats), groupCol)
      .where(col("_std") > 0.0)
      .withColumn("z", (col(valueCol) - col("_mean")) / col("_std"))
      .where(abs(col("z")) >= zThreshold)
      .drop("_mean", "_std")
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
