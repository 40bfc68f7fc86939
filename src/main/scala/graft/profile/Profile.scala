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
  * 100 TB scale-killer. Instead the exact path runs bounded passes over a
  * persisted keyed `groupBy(column, value)` relation (the shuffle state per
  * task is bounded by the value domain, never the row count):
  *
  *  1. one simple wide aggregate for min/max/avg/count/null-count;
  *  2. `(column, value) → count` (map-side combinable keyed shuffle),
  *     persisted; per-column min/max/n/n_distinct collected (one row per
  *     column);
  *  3. a fixed-width histogram (≤ cols × 1024 buckets) collected; quartile
  *     ranks lo = ⌊q·(n−1)⌋, hi = ⌈q·(n−1)⌉ are located in their buckets
  *     driver-side — pure arithmetic on the bounded histogram;
  *  4. ONLY the hit buckets' distinct values (≈ n_distinct/1024 rows per
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
    val spark = df.sparkSession

    // pass 1: simple wide aggregate — min/max/avg/count/null-count, one scan.
    // The (column, value) count relation doesn't depend on it, so its
    // materialization runs CONCURRENTLY with the collect (two independent
    // scan jobs share the cluster instead of serializing).
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      val d = col(c).cast("double")
      Seq(
        min(d).as(s"_${i}_min"),
        max(d).as(s"_${i}_max"),
        graft.functions.Rounding.dround(avg(d), avgScale).as(s"_${i}_avg"),
        count(col(c)).as(s"_${i}_cnt"),
        count(when(col(c).isNull, 1)).as(s"_${i}_null"))
    }
    val perVal = Quantiles.valueCounts(df, cols).persist()
    // pass 2, CONCURRENT with pass 1: materialize perVal and collect the
    // bounded histogram (carrying the exact distinct count) in the same job.
    // Bucketing stats come from perVal itself via a broadcast join — not
    // from the pass-1 row — so neither pass waits on the other; the bucket
    // arithmetic is identical to the driver-literal form the bounding pass
    // rebuilds below, so bucket ids agree bit for bit.
    val histF = scala.concurrent.Future {
      val statsDf = perVal.groupBy("_cn")
        .agg(min("_v").as("_mn"), max("_v").as("_mx"), sum("_c").as("_n"))
      val width = (col("_mx") - col("_mn")) / Buckets
      perVal.join(broadcast(statsDf), "_cn")
        .withColumn("_cr",
          when(col("_mx") === col("_mn"), lit(0L))
            .otherwise(least(floor((col("_v") - col("_mn")) / width),
              lit(Buckets - 1L))))
        .groupBy("_cn", "_cr")
        .agg(sum("_c").as("rc"), count(lit(1)).as("ndp"),
          first("_mn").as("mn"), first("_mx").as("mx"), first("_n").as("n"))
        .collect()
    }(scala.concurrent.ExecutionContext.global)
    val wideRow = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rawHist = scala.concurrent.Await.result(histF,
      scala.concurrent.duration.Duration.Inf)
    val (quartile: Map[String, Map[Double, Double]], nDistinct: Map[String, Long]) =
      try {
        // per-column domain + non-null count, straight off the histogram rows
        val stats: Map[String, (Double, Double, Long)] = rawHist.map { r =>
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

        val histRows = rawHist.map(r => (r.getAs[String]("_cn"),
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
          cn <- cols; (_, _, n) <- stats.get(cn).toSeq; q <- Quartiles
        } yield {
          val t = q * (n - 1).toDouble
          Target(cn, q, t, math.floor(t).toLong, math.ceil(t).toLong)
        }

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
          perVal.withColumn("_cr", crExpr).where(candFilter)
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
      } finally { perVal.unpersist(); () }

    val out = cols.zipWithIndex.map { case (c, i) =>
      def d(name: String): java.lang.Double =
        if (wideRow.isNullAt(wideRow.fieldIndex(name))) null
        else Double.box(wideRow.getDouble(wideRow.fieldIndex(name)))
      val qs = quartile.get(c)
      Row(c, d(s"_${i}_min"), d(s"_${i}_max"), d(s"_${i}_avg"),
        qs.map(m => Double.box(m(0.25))).orNull,
        qs.map(m => Double.box(m(0.5))).orNull,
        qs.map(m => Double.box(m(0.75))).orNull,
        wideRow.getLong(wideRow.fieldIndex(s"_${i}_cnt")),
        wideRow.getLong(wideRow.fieldIndex(s"_${i}_null")),
        nDistinct.getOrElse(c, 0L))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      profileSchema)
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
