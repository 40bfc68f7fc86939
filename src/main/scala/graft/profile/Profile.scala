package graft.profile

import graft.analytics.Quantiles
import graft.core.FieldBounds
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  private def summarizeExact(df: DataFrame, cols: Seq[String], avgScale: Int): DataFrame = {
    // Unpivot with the column INDEX as the key: the grouping shuffle hashes
    // and ships a 4-byte int per row instead of the column NAME (a ~15-char
    // string × every row — measured ~30% of the whole pass at sf0.1). The
    // reduced (distinct-value) relation then carries the index as a 1-char
    // string key through the shared machinery, and the index is mapped back
    // to the name only on the OUTPUT rows (a bounded local relation).
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"$i, CAST(`$c` AS DOUBLE)" }.mkString(", ")
    val perVal = df
      .select(expr(s"stack(${cols.length}, $stackArgs) AS (_ci, _v)"))
      .groupBy("_ci", "_v").agg(count(lit(1)).as("_c"))
      .select(col("_ci").cast("string").as("_cn"), col("_v"), col("_c"))
    profileKeyedCounts(perVal, Some(cols.indices.map(_.toString)), avgScale)
      .withColumn("column_name",
        element_at(array(cols.map(lit): _*), col("column_name").cast("int") + 1))
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
    *
    * FULLY DECLARATIVE in the key: the plan contains no driver-side literal
    * per-key expressions and no collect proportional to key cardinality ×
    * buckets — so `summarizeBy` survives a group column with millions of
    * distinct values. Two jobs:
    *
    *  1. persist + materialize the `(key, value) → count` relation (the
    *     single source scan);
    *  2. one composite query over the cache — per-key simple stats from a
    *     keyed aggregate, quartiles via the join-based
    *     [[Quantiles.quantileContFromCounts]] (whose prefix window is keyed
    *     by the profile key with ≤ `Buckets` rows per partition), assembled
    *     with two keyed left joins. The only collect is the OUTPUT rows
    *     (one per key) — the result SUMMARIZE returns anyway.
    */
  private def profileKeyed(keyed: DataFrame, keys: Option[Seq[String]],
                           avgScale: Int): DataFrame =
    profileKeyedCounts(
      keyed.groupBy("_cn", "_v").agg(count(lit(1)).as("_c")), keys, avgScale)

  /** [[profileKeyed]] over an ALREADY-GROUPED `(_cn, _v, _c)` relation —
    * the shape [[summarizeExact]] builds with its int-keyed shuffle. NULL
    * values must be kept as their own `(_cn, NULL)` groups (they feed
    * null_cnt).
    */
  private def profileKeyedCounts(perValPre: DataFrame, keys: Option[Seq[String]],
                                 avgScale: Int): DataFrame = {
    val spark = perValPre.sparkSession

    // The ONE keyed relation everything derives from: (key, value) → count
    // with NULL values kept as their own group (unlike Quantiles.valueCounts,
    // which is quantile-only and drops them). min/max/count/null-count, the
    // count-weighted average AND the quantile machinery all read it from
    // cache, so the source is scanned exactly once.
    val perVal = perValPre.persist()

    // Per-key simple stats — ONE fused aggregate serving both the output
    // row and (as `(_cn, _mn, _mx, _n)`) the quantile machinery, which
    // would otherwise run its own full pass over the counts relation. The
    // weighted mean Σ(v·c)/Σ(c) sums FEWER terms than a row-order mean
    // (one per distinct value), and the result is rounded to `avgScale`
    // exactly like the lazy path, which absorbs the summation-order ulp.
    // NULL value groups ride along: they feed null_cnt, are ignored by
    // min/max/sum(v·c), and n_distinct counts only non-null distinct
    // values.
    val nNonNull = sum(when(col("_v").isNotNull, col("_c")))
    val stats = perVal.groupBy("_cn").agg(
      min("_v").as("col_min"), max("_v").as("col_max"),
      graft.functions.Rounding.dround(sum(col("_v") * col("_c")) / nNonNull,
        avgScale).as("col_avg"),
      coalesce(nNonNull, lit(0L)).as("col_cnt"),
      coalesce(sum(when(col("_v").isNull, col("_c"))), lit(0L)).as("null_cnt"),
      count(when(col("_v").isNotNull, lit(1))).as("n_distinct"))
    try {
      // job 1: the single source scan, folded into the stats collect (one
      // row per key — output-bounded; reading through the perVal shuffle
      // materializes the cache). The rows come back as a LOCAL relation, so
      // every stats broadcast inside the quantile plan is free instead of a
      // separately materialized query stage.
      val statRows = stats.collect()
      val quantStatRows = statRows.toSeq.map(r =>
        Row(r.getString(0), r.get(1), r.get(2), r.get(4)))

      // job 2: the quartile plan (identical rank/interpolation arithmetic
      // to DuckDB's quantile_cont), collected in LONG form via the eager
      // bounding-rows terminal — ≤ 2 rows per (key, quantile), the same
      // output-bounded size as the result itself, with no final
      // aggregation exchange. With few keys the terminal takes its
      // driver-planned two-job fast path; beyond that the declarative
      // keyed-window plan keeps grouped profiling cardinality-safe.
      val quartRows = Quantiles
        .quantileContRowsFromCounts(perVal.where(col("_v").isNotNull),
          Quartiles, Buckets, precomputedStatRows = Some(quantStatRows))

      // Driver-side assembly — every relation here is bounded by the OUTPUT
      // size (what SUMMARIZE returns and the caller collects anyway), so
      // this is plan-shaping, not driver-side aggregation: it replaces a
      // pivot aggregate plus two broadcast joins with a hash merge.
      def droundD(x: Double): Double = {
        // the Column Rounding.dround formula verbatim (binary-value round)
        val p = math.pow(10, avgScale)
        if (x >= 0) math.floor(x * p + 0.5) / p
        else -(math.floor(-x * p + 0.5) / p)
      }
      val qByKey: Map[String, Map[Double, Double]] = quartRows.toSeq
        .groupBy(_.getString(0))
        .map { case (k, rs) =>
          k -> rs.map(r => r.getDouble(1) -> droundD(r.getDouble(2))).toMap
        }
      val statByKey = statRows.map(r => r.getString(0) -> r).toMap
      val outKeys: Seq[String] = keys match {
        case Some(ks) => ks // pinned by configuration (column-wise profile)
        case None => statRows.map(_.getString(0)).sorted.toSeq // observed
      }
      val rows: Seq[Row] = outKeys.map { key =>
        val s = statByKey.get(key)
        val q = qByKey.getOrElse(key, Map.empty)
        def stat(i: Int): Any = s.map(_.get(i)).getOrElse(null)
        def quart(p: Double): Any = q.get(p).map(Double.box).getOrElse(null)
        Row(key, stat(1), stat(2), stat(3),
          quart(0.25), quart(0.5), quart(0.75),
          s.map(_.getLong(4)).getOrElse(0L),
          s.map(_.getLong(5)).getOrElse(0L),
          s.map(_.getLong(6)).getOrElse(0L))
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        profileSchema)
    } finally { perVal.unpersist(); () }
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

  /** Per-group MAD (median-absolute-deviation) outliers — the ROBUST twin
    * of [[zscoreOutliers]]: median and MAD do not move when the outliers
    * themselves inflate the mean/stddev, which is exactly the failure mode
    * of a z-gate on heavy-tailed quality signals. Flags rows with
    * |x − med| / (1.4826·mad) ≥ `threshold` (1.4826 ≈ 1/Φ⁻¹(3/4) rescales
    * MAD to σ under normality; 3.5 is the classic cutoff).
    *
    * Plan shape: two passes of the bounded grouped-quantile machinery
    * ([[Quantiles.quantileContBy]] — keyed, no global sort, no unbounded
    * percentile state) for med and mad, each broadcast back onto the scan
    * like the z-gate's stats — the corpus itself never shuffles. Both
    * aggregates are rounded ONCE (6 dp) so the per-row deviation, the
    * robust z and the ≥ threshold decision are bit-reproducible across
    * engines and partitionings. Groups with mad = 0 (over half the group
    * at the median) yield no rows, like zero variance in the z-gate.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  threshold: Double): DataFrame = {
    val spark = df.sparkSession
    // ONE source scan: both quantiles derive from the same persisted
    // (group, value, count) relation — the deviation distribution is a
    // TRANSFORM of the value domain (|v − med| carries its value's count),
    // so the MAD pass re-aggregates the cached counts, never the corpus.
    // A lazy composite instead nests med's whole multi-stage plan inside
    // every branch of mad's — a multiplicative re-execution measured at
    // ~4× on the gate query.
    //
    // Every output-bounded intermediate (one row per group) is collected
    // and re-broadcast as a LOCAL relation, and the quantile passes get
    // their `(_cn, _mn, _mx, _n)` stats SUPPLIED instead of re-aggregating
    // the counts relation: the med pass reuses the job-1 aggregate, and the
    // dev pass needs no aggregate at all — max |v − med| over v ∈ [mn, mx]
    // is achieved at an interval endpoint (|·−c| is convex), the lower
    // bound 0 is a valid bucket cover, and n is unchanged by the transform.
    // Measured on the gate query this halves the job count vs letting each
    // pass derive its own stats.
    val counts = df
      .select(col(groupCol).cast("string").as("_cn"),
        col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
      .groupBy("_cn", "_v").agg(count(lit(1)).as("_c"))
      .persist()
    def localDf(rows: Seq[Row], schema: StructType): DataFrame =
      spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val medSchema = StructType(Seq(
      StructField("_cn", StringType, nullable = false),
      StructField("_med", DoubleType)))
    try {
      // job 1: the single source scan, folded into the per-group stats
      // aggregate (one output row per group)
      val statRows = counts.groupBy("_cn")
        .agg(min("_v").as("_mn"), max("_v").as("_mx"), sum("_c").as("_n"))
        .collect()
      // dround's Column formula replicated on the driver (binary round)
      def dround6(x: Double): Double =
        if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
        else -(math.floor(-x * 1e6 + 0.5) / 1e6)
      // job 2: med over the cache, stats supplied, bounding rows folded
      // driver-side (no final aggregation exchange)
      val medRows = Quantiles
        .quantileContRowsFromCounts(counts, Seq(0.5),
          precomputedStatRows = Some(statRows.toSeq))
        .collect { case r if !r.isNullAt(2) =>
          Row(r.getString(0), dround6(r.getDouble(2)))
        }
      val medDf = localDf(medRows, medSchema)
      val medBy = medRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
      val devStatRows = statRows.toSeq.flatMap { r =>
        val k = r.getString(0)
        medBy.get(k).map { m =>
          Row(k, 0.0,
            math.max(math.abs(r.getDouble(1) - m), math.abs(r.getDouble(2) - m)),
            r.getLong(3))
        }
      }
      // persisted: the MAD pass reads the deviation counts from BOTH its
      // bucket-totals and ranking jobs — unpersisted, each would redo the
      // cache join + grouping shuffle
      val devCounts = counts.join(broadcast(medDf), "_cn")
        .select(col("_cn"), abs(col("_v") - col("_med")).as("_v"), col("_c"))
        .groupBy("_cn", "_v").agg(sum("_c").as("_c")) // distinct devs fold
        .persist()
      // job 3: mad over the cache-derived deviation counts, stats supplied
      val madQuantRows =
        try Quantiles.quantileContRowsFromCounts(devCounts, Seq(0.5),
          precomputedStatRows = Some(devStatRows))
        finally { devCounts.unpersist(); () }
      val madRows = madQuantRows.collect { case r if !r.isNullAt(2) =>
        Row(r.getString(0), dround6(r.getDouble(2)))
      }
      val stats = localDf(
        madRows.toSeq.flatMap { r =>
          val k = r.getString(0)
          medBy.get(k).map(m => Row(k, m, r.getDouble(1)))
        },
        StructType(Seq(StructField(groupCol + "_mad_key", StringType, nullable = false),
          StructField("_med", DoubleType), StructField("_mad", DoubleType))))
      df.join(broadcast(stats),
          col(groupCol).cast("string") === col(groupCol + "_mad_key"))
        .where(col("_mad") > 0.0)
        .withColumn("_dev", abs(col(valueCol).cast("double") - col("_med")))
        .withColumn("mad_z", col("_dev") / (lit(1.4826) * col("_mad")))
        .where(col("mad_z") >= threshold)
        .drop(groupCol + "_mad_key", "_med", "_dev", "_mad")
    } finally { counts.unpersist(); () }
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
