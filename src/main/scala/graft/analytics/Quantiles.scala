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

  /** Exact interpolated quantiles (DuckDB/Postgres `quantile_cont` /
    * `percentile_cont` semantics) for several columns in ONE pass, with no
    * per-value global state and no single-partition window.
    *
    * Spark's built-in exact `percentile()` is a `TypedImperativeAggregate`
    * whose buffer holds EVERY distinct (value, count) pair — on a near-unique
    * 100 TB column that state is the table, concentrated into one final
    * reduce task. This plan keeps everything keyed:
    *
    *  1. unpivot the requested columns and `groupBy(column, value)` — a
    *     map-side-combinable shuffle whose value domain, not row count,
    *     bounds the state;
    *  2. per-column min/max/total (tiny) → a fixed-width histogram id per
    *     distinct value; per-bucket counts (≤ cols × `buckets` rows) and
    *     their exclusive prefix via a broadcast triangular join;
    *  3. locate, per requested quantile q, the two global ranks
    *     lo = ⌊q·(n−1)⌋ and hi = ⌈q·(n−1)⌉ inside the (≤ 2 per quantile)
    *     histogram buckets that contain them — ONLY those buckets' distinct
    *     values (≈ distinct/`buckets` rows) are then ranked with a keyed
    *     window to find the bounding values, which are linearly
    *     interpolated: v_lo + (q·(n−1) − lo)·(v_hi − v_lo).
    *
    * Returns one row per (column, quantile): `(column_name, q, value)`.
    * NULLs are ignored (quantile_cont semantics); a column with no non-null
    * rows yields no output rows.
    */
  def quantileCont(df: DataFrame, cols: Seq[String], qs: Seq[Double],
                   buckets: Int = 1024): DataFrame =
    quantileContFromCounts(valueCounts(df, cols), qs, buckets)

  /** `(_cn, _v, _c)` distinct-value counts for `cols` of `df`, the shared
    * input of [[quantileContFromCounts]] and an exact per-column distinct
    * count (`groupBy(_cn).count`) — one unpivoted scan, one keyed shuffle.
    */
  def valueCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    df.select(expr(s"stack(${cols.length}, $stackArgs) AS (_cn, _v)"))
      .where(col("_v").isNotNull)
      .groupBy("_cn", "_v").agg(count(lit(1)).as("_c"))
  }

  /** Exact interpolated quantiles PER GROUP — the same bounded keyed plan as
    * [[quantileCont]] with the GROUP VALUE as the key instead of the column
    * name, so per-task state is bounded by each group's value domain and no
    * group is ever sorted globally. Returns `(groupCol, q, value)`.
    *
    * As a LAZY composite the plan references the counts relation from
    * several branches; AQE's stage reuse collapses most of them but the
    * source still scans ~3× (measured). For one scan over a large corpus,
    * persist the `(_cn, _v, _c)` relation and call
    * [[quantileContFromCounts]] — `Profile.summarize(exact = true)` is the
    * eager single-scan implementation of exactly that.
    */
  def quantileContBy(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Double], buckets: Int = 1024): DataFrame =
    quantileContFromCounts(
      df.select(col(groupCol).cast("string").as("_cn"),
          col(valueCol).cast("double").as("_v"))
        .where(col("_v").isNotNull)
        .groupBy("_cn", "_v").agg(count(lit(1)).as("_c")),
      qs, buckets)
      .withColumnRenamed("column_name", groupCol)

  /** EAGER [[quantileContBy]]: persists the `(_cn, _v, _c)` counts relation
    * so the source is scanned exactly ONCE (the lazy composite re-reads it
    * from the stats/bucket/candidate branches — ~3× measured), runs the
    * bounded quantile plan against the cache, materializes the result
    * (one row per (group, quantile) — the output itself), and unpersists.
    * This is the scale path for one-shot grouped quantiles over a large
    * corpus; the lazy form remains for composition into bigger plans.
    */
  def quantileContByEager(df: DataFrame, groupCol: String, valueCol: String,
                          qs: Seq[Double], buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.Row
    val counts = df
      .select(col(groupCol).cast("string").as("_cn"),
        col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
      .groupBy("_cn", "_v").agg(count(lit(1)).as("_c"))
      .persist()
    try withoutAqe(df.sparkSession) {
      // job 1: the single source scan, folded into the per-group stats +
      // distinct-count aggregate (one output row per group), capped at
      // MaxDriverKeys + 1 rows so unbounded group cardinality never
      // funnels through the driver.
      val probe = counts.groupBy("_cn")
        .agg(min("_v").as("_mn"), max("_v").as("_mx"), sum("_c").as("_n"),
          count(lit(1)).as("_ndv"))
        .limit(MaxDriverKeys + 1).collect()
      val rows: Seq[Row] =
        if (probe.length > MaxDriverKeys)
          // high group cardinality: the fully-declarative keyed plan
          quantileContFromCounts(counts, qs, buckets).collect().toSeq
            .sortBy(r => (r.getString(0), r.getDouble(1)))
        else if (probe.iterator.map(_.getLong(4)).sum <= DriverValueCap) {
          // driver-values terminal: the whole value domain is config-
          // bounded, so ONE more cache job collects the counts relation and
          // the interpolation is local — identical arithmetic, no further
          // distributed stages.
          val byKey = counts.collect().groupBy(_.getString(0))
          byKey.toSeq.sortBy(_._1).flatMap { case (k, rs) =>
            val vals = rs.map(r => r.getDouble(1) -> r.getLong(2))
              .sortBy(_._1).toIndexedSeq
            val n = vals.iterator.map(_._2).sum
            qs.sorted.map(q => Row(k, q, quantileContLocal(vals, n, q).orNull))
          }
        } else {
          // job 2: cache-only; the collected bounding rows ARE the output
          val statRows = probe.toSeq.map(r =>
            Row(r.getString(0), r.get(1), r.get(2), r.get(3)))
          quantileContRowsFromCounts(counts, qs, buckets,
            precomputedStatRows = Some(statRows))
        }
      df.sparkSession.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        org.apache.spark.sql.types.StructType(quantileSchema.fields.map(f =>
          if (f.name == "column_name") f.copy(name = groupCol) else f)))
    } finally { counts.unpersist(); () }
  }

  /** [[quantileCont]] over a pre-aggregated `(_cn, _v, _c)` relation.
    *
    * `precomputedStats`: a `(_cn, _mn, _mx, _n)` relation (per-key min /
    * max / non-null count) a caller already has — the exact profile
    * computes one fused per-key aggregate for its simple statistics and
    * threads it in here, saving a second full aggregation pass over the
    * counts relation. Must agree with `perVal` (same keys, null-free
    * values); when absent the stats are derived from `perVal` directly.
    */
  def quantileContFromCounts(perVal: DataFrame, qs: Seq[Double],
                             buckets: Int = 1024,
                             precomputedStats: Option[DataFrame] = None,
                             hinted: Boolean = true): DataFrame = {
    rankedBounding(perVal, qs, buckets, precomputedStats, hinted)
      .groupBy(col("_cn"), col("_q"), col("_t"), col("_lo"))
      .agg(
        max(when(col("_lo") >= col("_before") &&
          col("_lo") < col("_before") + col("_c"), col("_v"))).as("_vlo"),
        max(when(col("_hi") >= col("_before") &&
          col("_hi") < col("_before") + col("_c"), col("_v"))).as("_vhi"))
      .select(col("_cn").as("column_name"), col("_q").as("q"),
        (col("_vlo") + (col("_t") - col("_lo")) * (col("_vhi") - col("_vlo")))
          .as("value"))
  }

  /** Keys at or below this count take the driver-planned fast path in
    * [[quantileContRowsFromCounts]]: the per-bucket totals collect is then
    * ≤ `MaxDriverKeys` × `buckets` rows — bounded by CONFIGURATION, like
    * the histogram itself. Above it the fully-declarative plan runs (its
    * prefix window is keyed, so it holds at any key cardinality).
    */
  private[graft] val MaxDriverKeys = 64

  /** When a profiled relation's TOTAL distinct (key, value) count is at or
    * below this, the eager paths collect the counts relation itself — a
    * configuration-bounded collect of the same order as the keys × buckets
    * totals the fast path already ships — and run median/quantile
    * interpolation locally with the identical IEEE arithmetic, replacing
    * several sequential bounded jobs with ONE. Above it nothing is
    * collected beyond the usual bounded relations.
    */
  private[graft] val DriverValueCap = 65536

  /** Cap for the hit-bucket driver terminal of [[quantilesFromBuckets]]:
    * unlike [[DriverValueCap]] (which gates collecting a WHOLE counts
    * relation) this bounds only the few quantile-hit buckets' distinct
    * values — ≤ 2·|qs| buckets per key by construction — so it can sit
    * higher (256k rows ≈ a few tens of MB of transient driver Rows).
    * A near-unique column at real scale has millions of distinct values
    * per bucket and falls through to the keyed-window ranking unchanged.
    */
  private[graft] val HitValueCap = 1 << 18

  /** Prefix width of the value-only bucketing: bucket id = top 16 bits of
    * the order-preserving long image of the double (sign + 11 exponent + 4
    * mantissa bits), so a bucket spans 1/16 of a binade and the bucket
    * space is hard-capped at 2^16 per key. Monotone and value-only — no
    * min/max pre-pass — which is what lets the histogram fuse into the
    * stats aggregate.
    */
  private val BucketBits = 16

  private def bitBucket(v: Column): Column =
    shiftrightunsigned(graft.functions.native.sortableBits(v), 64 - BucketBits)

  /** Runs `f` with AQE disabled, restoring the conf afterwards. The eager
    * bounded paths execute a handful of statically-tiny stages (every
    * exchange is config-bounded); AQE re-plans and schedules each as its
    * own job, adding ~100 ms of latency per stage at interactive scale and
    * optimizing nothing. Result values are unaffected.
    */
  private[graft] def withoutAqe[T](spark: org.apache.spark.sql.SparkSession)(f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** quantile_cont over locally-held ASCENDING (value, count) pairs — the
    * identical target/interpolation arithmetic of the distributed plans.
    * `n` must equal the sum of counts; None when n == 0.
    */
  private[graft] def quantileContLocal(vals: IndexedSeq[(Double, Long)],
      n: Long, q: Double): Option[Double] = {
    if (n <= 0 || vals.isEmpty) None
    else {
      val t = q * (n - 1).toDouble
      val lo = math.floor(t).toLong
      val hi = math.ceil(t).toLong
      def vAt(r: Long): Double = {
        var pr = 0L
        var i = 0
        while (i < vals.length) {
          if (r < pr + vals(i)._2) return vals(i)._1
          pr += vals(i)._2
          i += 1
        }
        vals.last._1
      }
      val vlo = vAt(lo)
      Some(vlo + (t - lo) * (vAt(hi) - vlo))
    }
  }

  private[graft] final case class BBucket(bb: Long, nRows: Long, nd: Long,
      mn: Double, mx: Double, prefix: Long)

  /** Per-key rollup of the fused bucket rows: ascending non-null buckets
    * with exclusive prefixes, plus everything a profile's simple statistics
    * need. Buckets are monotone in the value, so mn/mx are the first/last
    * bucket's. */
  private[graft] final case class BKey(buckets: IndexedSeq[BBucket], n: Long,
      nulls: Long, nd: Long, svc: Double) {
    def mn: Option[Double] = buckets.headOption.map(_.mn)
    def mx: Option[Double] = buckets.lastOption.map(_.mx)
  }

  /** ONE fused job over a persisted `(_cn, _v, _c)` relation (null values
    * kept as their own rows): per-(key, prefix-bucket) row count, distinct
    * count, min, max and Σ(v·c). ≤ keys × 2^16 rows — hard config bound;
    * realistic occupancy is ≤ 16 buckets per occupied binade. Simple stats
    * AND the quantile histogram both derive from these rows, collapsing the
    * separate stats pass and bucket-totals pass into this single aggregate.
    * Null values land in bucket −1 (they feed only the null count).
    */
  private[graft] def fusedBucketStats(perVal: DataFrame): Map[String, BKey] = {
    val rows = perVal.groupBy(col("_cn"),
        when(col("_v").isNull, lit(-1L)).otherwise(bitBucket(col("_v"))).as("_bb"))
      .agg(sum("_c").as("_rows"), count(col("_v")).as("_nd"),
        min("_v").as("_mn"), max("_v").as("_mx"),
        sum(col("_v") * col("_c")).as("_svc"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (k, rs) =>
      val nulls = rs.collectFirst {
        case r if r.getLong(1) == -1L => r.getLong(2)
      }.getOrElse(0L)
      val nn = rs.filter(_.getLong(1) >= 0L).sortBy(_.getLong(1))
      var pr = 0L
      val bs = nn.map { r =>
        val b = BBucket(r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), pr)
        pr += r.getLong(2)
        b
      }.toIndexedSeq
      k -> BKey(bs, pr, nulls, nn.map(_.getLong(3)).sum,
        nn.foldLeft(0.0)((a, r) => a + (if (r.isNullAt(6)) 0.0 else r.getDouble(6))))
    }
  }

  /** Quantiles from [[fusedBucketStats]] rollups: a target rank landing in
    * a SINGLE-VALUE bucket reads the value straight off the bucket row (min
    * == max) — zero further work, the common case for low-cardinality
    * columns; only multi-value hit buckets go to ONE bounded ranking job
    * (the job-B shape of the fixed-width fast path, keyed by the prefix
    * bucket). Identical target and interpolation arithmetic to every other
    * path. Returns (key, q) → value; keys with n == 0 map to None.
    */
  private[graft] def quantilesFromBuckets(perVal: DataFrame, qs: Seq[Double],
      byKey: Map[String, BKey]): Map[(String, Double), Option[Double]] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // rank targets: (key, q, t, lo, hi); per rank either a direct value or
    // a (key, bucket) to rank distributively
    final case class Tgt(key: String, q: Double, t: Double, lo: Long, hi: Long)
    val targets = for {
      (k, b) <- byKey.toSeq if b.n > 0
      q <- qs
    } yield {
      val t = q * (b.n - 1).toDouble
      Tgt(k, q, t, math.floor(t).toLong, math.ceil(t).toLong)
    }
    def bucketOf(b: BKey, r: Long): BBucket = {
      // binary search over exclusive prefixes
      var loI = 0
      var hiI = b.buckets.length - 1
      while (loI < hiI) {
        val mid = (loI + hiI + 1) >>> 1
        if (b.buckets(mid).prefix <= r) loI = mid else hiI = mid - 1
      }
      b.buckets(loI)
    }
    def direct(k: String, r: Long): Option[Double] = {
      val bu = bucketOf(byKey(k), r)
      if (bu.nd == 1L) Some(bu.mn) else None
    }
    val unresolved = targets.filter(t =>
      direct(t.key, t.lo).isEmpty || direct(t.key, t.hi).isEmpty)
    val ranked: Seq[Row] = if (unresolved.isEmpty) Nil else {
      val spark = perVal.sparkSession
      def local(rows: Seq[Row], schema: StructType): DataFrame =
        spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      val hit = scala.collection.mutable.LinkedHashMap.empty[(String, Long), Long]
      unresolved.foreach { t =>
        Seq(t.lo, t.hi).foreach { r =>
          val bu = bucketOf(byKey(t.key), r)
          if (bu.nd > 1L) hit.getOrElseUpdate((t.key, bu.bb), bu.prefix)
        }
      }
      val hitNd = hit.keys.iterator.map { case (k, bb) =>
        byKey(k).buckets.find(_.bb == bb).map(_.nd).getOrElse(0L)
      }.sum
      if (hitNd <= HitValueCap) {
        // Driver-values terminal: the hit buckets' whole value domain is
        // config-bounded, so ONE filter + collect (no shuffle, no sort, no
        // window stage) fetches the distinct (value, count) pairs and the
        // ranking is exact LONG driver arithmetic — the rows produced are
        // identical to the distributed window's. The job-count win: the
        // distributed ranking pays an exchange + sort + window + two
        // broadcast joins for what is, by construction, a few thousand
        // rows. Beyond the cap (a near-unique column whose buckets each
        // hold millions of distinct values) the keyed window below runs
        // unchanged.
        val hitPredL = hit.keys.toSeq.groupBy(_._1).map { case (k, pairs) =>
          col("_cn") === k && col("_bb").isin(pairs.map(_._2): _*)
        }.reduce(_ || _)
        // coalesce(8): folds the (cache-partitioned) filter scan into 8
        // tasks without an exchange — at 32 near-empty partitions the
        // per-task scheduling overhead was 3-5x the actual filter work
        // (measured 160-250 ms -> ~47 ms at sf0.1). Work is unchanged;
        // this branch is already gated on a config-bounded result.
        val collected = perVal.where(col("_v").isNotNull)
          .withColumn("_bb", bitBucket(col("_v")))
          .where(hitPredL)
          .select("_cn", "_bb", "_v", "_c")
          .coalesce(8)
          .collect()
        val byBucket = collected.groupBy(r => (r.getString(0), r.getLong(1)))
        val out = Seq.newBuilder[Row]
        for (((k, bb), pr) <- hit) {
          val rows = byBucket.getOrElse((k, bb), Array.empty)
            .sortBy(_.getDouble(2))
          var before = pr
          val ranksWanted = unresolved.filter(_.key == k)
            .flatMap(t => Seq(t.q -> t.lo, t.q -> t.hi))
          rows.foreach { r =>
            val c = r.getLong(3)
            ranksWanted.foreach { case (q, rank) =>
              if (rank >= before && rank < before + c)
                out += Row(k, q, before, c, r.getDouble(2))
            }
            before += c
          }
        }
        out.result().distinct
      } else {
      val hitDf = local(hit.toSeq.map { case ((k, bb), pr) => Row(k, bb, pr) },
        StructType(Seq(StructField("_cn", StringType, nullable = false),
          StructField("_bb", LongType, nullable = false),
          StructField("_pr", LongType, nullable = false))))
      // Literal hit-bucket predicate: unlike the join, a filter on
      // (functions of) the GROUPING columns pushes below the counts
      // aggregate all the way to the source scan, so an unpersisted caller
      // re-derives only the hit buckets' rows (a few percent of the
      // domain), not the whole counts relation. ≤ 2·|qs| terms per key.
      val hitPred = hit.keys.toSeq.groupBy(_._1).map { case (k, pairs) =>
        col("_cn") === k && col("_bb").isin(pairs.map(_._2): _*)
      }.reduce(_ || _)
      val tgtDf = local(unresolved.map(t => Row(t.key, t.q, t.t, t.lo, t.hi)),
        StructType(Seq(StructField("_cn", StringType, nullable = false),
          StructField("_q", DoubleType, nullable = false),
          StructField("_t", DoubleType, nullable = false),
          StructField("_lo", LongType, nullable = false),
          StructField("_hi", LongType, nullable = false))))
      val candidates = perVal.where(col("_v").isNotNull)
        .withColumn("_bb", bitBucket(col("_v")))
        .where(hitPred)
        .join(broadcast(hitDf), Seq("_cn", "_bb"))
      val wBucket = Window.partitionBy("_cn", "_bb").orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
      candidates
        .withColumn("_before", col("_pr") + coalesce(sum("_c").over(wBucket), lit(0L)))
        .join(broadcast(tgtDf), Seq("_cn"))
        .where((col("_lo") >= col("_before") && col("_lo") < col("_before") + col("_c")) ||
               (col("_hi") >= col("_before") && col("_hi") < col("_before") + col("_c")))
        .select("_cn", "_q", "_before", "_c", "_v")
        .collect().toSeq
      }
    }
    val rankedBy = ranked.groupBy(r => (r.getString(0), r.getDouble(1)))
    targets.map { t =>
      def vAt(r: Long): Option[Double] = direct(t.key, r).orElse(
        rankedBy.getOrElse((t.key, t.q), Nil).find(row =>
          r >= row.getLong(2) && r < row.getLong(2) + row.getLong(3))
          .map(_.getDouble(4)))
      val v = for (vlo <- vAt(t.lo); vhi <- vAt(t.hi))
        yield vlo + (t.t - t.lo) * (vhi - vlo)
      (t.key, t.q) -> v
    }.toMap ++
      byKey.collect { case (k, b) if b.n == 0 =>
        qs.map(q => (k, q) -> (None: Option[Double]))
      }.flatten
  }

  /** EAGER terminal form of [[quantileContFromCounts]]: collects the
    * bounding rows (≤ 2 per (key, quantile) — the OUTPUT bound, exactly
    * what the eager callers collect anyway) and interpolates driver-side,
    * saving the final aggregation exchange of every pass. Identical
    * arithmetic; returns plain Rows `(column_name, q, value)`.
    *
    * `precomputedStatRows`: the per-key `(_cn, _mn, _mx, _n)` stats the
    * eager callers ALREADY hold as collected rows (their stats job is the
    * materialization pass). With ≤ [[MaxDriverKeys]] keys this unlocks the
    * fast path: per-bucket totals are collected (≤ keys × `buckets` rows —
    * configuration-bounded) and the exclusive prefix + quantile-target
    * bucket location run as driver arithmetic, so the whole pass is TWO
    * single-exchange jobs over the counts relation instead of the five-odd
    * query stages of the declarative plan — at toy scale the stage overhead
    * is most of the wall time, and at 100 TB two cache passes beat five.
    * Beyond `MaxDriverKeys` the declarative plan runs unchanged (grouped
    * profiling at data-sized key cardinality must never collect
    * keys × buckets rows).
    */
  def quantileContRowsFromCounts(perVal: DataFrame, qs: Seq[Double],
                                 buckets: Int = 1024,
                                 precomputedStats: Option[DataFrame] = None,
                                 precomputedStatRows: Option[Seq[org.apache.spark.sql.Row]] = None)
      : Seq[org.apache.spark.sql.Row] = {
    val picked = precomputedStatRows match {
      case Some(rows) if rows.lengthCompare(MaxDriverKeys) <= 0 =>
        boundingSmallKeys(perVal, qs, buckets, rows)
      case Some(rows) =>
        val statsDf = localStatsDf(perVal, rows)
        rankedBounding(perVal, qs, buckets, Some(statsDf)).collect()
      case None =>
        rankedBounding(perVal, qs, buckets, precomputedStats).collect()
    }
    picked.groupBy(r => (r.getString(0), r.getDouble(1))).toSeq
      .map { case ((cn, q), rs) =>
        val t = rs.head.getDouble(2)
        val lo = rs.head.getLong(3)
        val hi = rs.head.getLong(4)
        def vAt(rank: Long): Option[Double] = rs.find(r =>
          rank >= r.getLong(5) && rank < r.getLong(5) + r.getLong(6))
          .map(_.getDouble(7))
        val v = for (vlo <- vAt(lo); vhi <- vAt(hi))
          yield vlo + (t - lo) * (vhi - vlo)
        org.apache.spark.sql.Row(cn, q, v.orNull)
      }
      .sortBy(r => (r.getString(0), r.getDouble(1)))
  }

  private def localStatsDf(perVal: DataFrame,
      rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    perVal.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_cn",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_mn",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("_mx",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("_n",
          org.apache.spark.sql.types.LongType))))

  /** The bounded-keys fast path of [[quantileContRowsFromCounts]]. Job A
    * collects per-bucket totals (≤ keys × buckets rows); the exclusive
    * bucket prefix, the quantile target ranks lo = ⌊q·(n−1)⌋ /
    * hi = ⌈q·(n−1)⌉ and the buckets containing them are pure driver
    * arithmetic (exact LONG sums, the identical IEEE double ops of the
    * declarative `targets` sub-plan). Job B re-enters the hit buckets +
    * targets as LOCAL relations and ranks ONLY those buckets' values with
    * the same keyed window as the declarative plan — same rows out,
    * bit-identical values.
    */
  private def boundingSmallKeys(perVal: DataFrame, qs: Seq[Double],
      buckets: Int, statRows: Seq[org.apache.spark.sql.Row])
      : Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = perVal.sparkSession
    val statsDf = localStatsDf(perVal, statRows)
    val width = (col("_mx") - col("_mn")) / buckets
    val bucketed = perVal.join(broadcast(statsDf), "_cn")
      .withColumn("_cr",
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(floor((col("_v") - col("_mn")) / width),
            lit(buckets - 1L))))
      .select("_cn", "_v", "_c", "_cr")

    // job A: per-bucket totals — ≤ keys × buckets rows by the caller gate
    val rt = bucketed.groupBy("_cn", "_cr").agg(sum("_c").as("_rc")).collect()

    val nByKey: Map[String, Long] = statRows.collect {
      case r if !r.isNullAt(3) => r.getString(0) -> r.getLong(3)
    }.toMap
    val hit = scala.collection.mutable.LinkedHashMap.empty[(String, Long), Long]
    val targets = Seq.newBuilder[Row] // (_cn, _q, _t, _lo, _hi)
    rt.groupBy(_.getString(0)).foreach { case (k, rs) =>
      val n = nByKey.getOrElse(k, 0L)
      if (n > 0) {
        // exclusive prefix over buckets in _cr order — exact LONG arithmetic
        val sorted = rs.sortBy(_.getLong(1))
        val prefixes = sorted.scanLeft(0L)(_ + _.getLong(2))
        for (q <- qs) {
          val t = q * (n - 1).toDouble // the declarative plan's exact ops
          val lo = math.floor(t).toLong
          val hi = math.ceil(t).toLong
          targets += Row(k, q, t, lo, hi)
          var i = 0
          while (i < sorted.length) {
            val pr = prefixes(i); val rc = sorted(i).getLong(2)
            if ((lo >= pr && lo < pr + rc) || (hi >= pr && hi < pr + rc))
              hit.getOrElseUpdate((k, sorted(i).getLong(1)), pr)
            i += 1
          }
        }
      }
    }
    def local(rows: Seq[Row], schema: StructType): DataFrame =
      spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val hitDf = local(hit.toSeq.map { case ((k, cr), pr) => Row(k, cr, pr) },
      StructType(Seq(StructField("_cn", StringType, nullable = false),
        StructField("_cr", LongType, nullable = false),
        StructField("_pr", LongType, nullable = false))))
    val targetsDf = local(targets.result(),
      StructType(Seq(StructField("_cn", StringType, nullable = false),
        StructField("_q", DoubleType, nullable = false),
        StructField("_t", DoubleType, nullable = false),
        StructField("_lo", LongType, nullable = false),
        StructField("_hi", LongType, nullable = false))))

    // job B: rank ONLY the hit buckets' values — identical window + filter
    // to the declarative plan's final stage
    val candidates = bucketed.join(broadcast(hitDf), Seq("_cn", "_cr"))
    val wBucket = Window.partitionBy("_cn", "_cr").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    candidates
      .withColumn("_before", col("_pr") + coalesce(sum("_c").over(wBucket), lit(0L)))
      .join(broadcast(targetsDf), Seq("_cn"))
      .where((col("_lo") >= col("_before") && col("_lo") < col("_before") + col("_c")) ||
             (col("_hi") >= col("_before") && col("_hi") < col("_before") + col("_c")))
      .select("_cn", "_q", "_t", "_lo", "_hi", "_before", "_c", "_v")
      .collect()
  }

  /** The schema of [[quantileContRowsFromCounts]] rows (and of
    * [[quantileContFromCounts]] output). */
  val quantileSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("column_name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("q",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))

  /** Shared keyed prefix of the quantile plans: everything up to (and
    * including) locating, per requested quantile, the rows of the hit
    * buckets whose rank ranges contain lo/hi. Output columns:
    * `(_cn, _q, _t, _lo, _hi, _before, _c, _v)` — ≤ 2 rows per
    * (key, quantile) after the rank filter.
    */
  private def rankedBounding(perVal: DataFrame, qs: Seq[Double],
                             buckets: Int,
                             precomputedStats: Option[DataFrame],
                             hinted: Boolean = true): DataFrame = {
    require(qs.nonEmpty && buckets >= 1)
    // `hinted = false` drops every broadcast hint: the large-key declarative
    // caller's side relations are KEY-cardinality (data-sized), so they must
    // meet the counts relation in keyed shuffle joins, not broadcasts.
    def bcast(df: DataFrame): DataFrame = if (hinted) broadcast(df) else df

    // 2. per-column stats (one row per column — broadcast everywhere)
    val stats = precomputedStats.getOrElse(perVal.groupBy("_cn")
      .agg(min("_v").as("_mn"), max("_v").as("_mx"), sum("_c").as("_n")))
    val width = (col("_mx") - col("_mn")) / buckets
    val bucketed = perVal.join(bcast(stats), "_cn")
      .withColumn("_cr",
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(floor((col("_v") - col("_mn")) / width),
            lit(buckets - 1L))))
      .select("_cn", "_v", "_c", "_cr")

    // per-bucket totals + exclusive prefix (≤ cols × buckets rows). The
    // prefix is a window KEYED by the column/group key: partition size is
    // bounded by `buckets` — configuration, not data — so the plan holds at
    // ANY key cardinality (a triangular prefix join would broadcast
    // keys × buckets rows and do keys × buckets² comparisons, which dies at
    // high-cardinality grouped profiling).
    val rangeTotals = bucketed.groupBy("_cn", "_cr").agg(sum("_c").as("_rc"))
    val wRange = Window.partitionBy("_cn").orderBy("_cr")
      .rowsBetween(Window.unboundedPreceding, -1)
    val rangePrefix = rangeTotals
      .withColumn("_pr", coalesce(sum("_rc").over(wRange), lit(0L)))

    // 3. target ranks per quantile (tiny), the buckets that contain them,
    //    and a keyed window over ONLY those buckets' values
    val targets = stats
      .select(col("_cn"), col("_n"),
        explode(array(qs.map(lit(_)): _*)).as("_q"))
      .withColumn("_t", col("_q") * (col("_n") - 1).cast("double"))
      .withColumn("_lo", floor(col("_t")))
      .withColumn("_hi", ceil(col("_t")))
      .select("_cn", "_q", "_t", "_lo", "_hi")

    val hitRaw = targets.join(rangePrefix, Seq("_cn"))
      .where((col("_lo") >= col("_pr") && col("_lo") < col("_pr") + col("_rc")) ||
             (col("_hi") >= col("_pr") && col("_hi") < col("_pr") + col("_rc")))
      .select("_cn", "_cr", "_pr")
    // A bucket row can repeat only when DIFFERENT targets hit the same
    // bucket — with a single requested quantile each bucket joins at most
    // one target, so the dedup exchange is pure overhead there.
    val hitBuckets = if (qs.lengthCompare(1) == 0) hitRaw else hitRaw.distinct()

    val candidates = bucketed.join(bcast(hitBuckets), Seq("_cn", "_cr"))
    val wBucket = Window.partitionBy("_cn", "_cr").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = candidates
      .withColumn("_before", col("_pr") + coalesce(sum("_c").over(wBucket), lit(0L)))

    ranked.join(bcast(targets), Seq("_cn"))
      .where((col("_lo") >= col("_before") && col("_lo") < col("_before") + col("_c")) ||
             (col("_hi") >= col("_before") && col("_hi") < col("_before") + col("_c")))
      .select("_cn", "_q", "_t", "_lo", "_hi", "_before", "_c", "_v")
  }

  /** NTILE(n) over ORDER BY (valueCol, tieCol), as a new LONG column
    * `bucketCol`. `coarseWidth` is the value-range width of the stage-2
    * window partitions — pick it so `(max-min)/coarseWidth` is O(100–1000)
    * for the column's DOMAIN (not its row count).
    * (valueCol, tieCol) must be a total order (tieCol unique per value), the
    * same contract as a deterministic NTILE. NULL values are bucketed FIRST
    * — identical to the built-in `ntile(n).over(orderBy(v, tie))` (Spark's
    * default ascending order is NULLS FIRST); they are never dropped.
    */
  def exactNtile(df: DataFrame, valueCol: String, tieCol: String, n: Int,
                 coarseWidth: Double, bucketCol: String = "bucket"): DataFrame = {
    require(n >= 1 && coarseWidth > 0)
    val v = col(valueCol)

    // Value-domain probe (one bounded job): when the distinct-value count is
    // config-bounded, the exclusive global prefix per value is driver
    // arithmetic over the collected per-value counts — the whole
    // prefix/triangular-join sub-plan collapses to a broadcast local map,
    // leaving one keyed window plus one broadcast join. Beyond the cap the
    // fully-declarative decomposition below runs unchanged.
    val probe = withoutAqe(df.sparkSession) {
      df.groupBy(v.as("_v")).agg(count(lit(1)).as("_c"))
        .limit(DriverValueCap + 1).collect()
    }
    if (probe.length <= DriverValueCap) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      // ascending with NULLS FIRST — identical to the built-in ntile's
      // default ascending order (and to the sentinel range of the big path)
      val sorted = probe.sortWith { (a, b) =>
        val (x, y) = (a.get(0), b.get(0))
        if (x == null) y != null
        else y != null && x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
      }
      var pr = 0L
      val beforeRows = sorted.map { r =>
        val row = Row(r.get(0), pr)
        pr += r.getLong(1)
        row
      }.toSeq
      val total = pr
      val beforeDf = df.sparkSession.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(beforeRows).asJava),
        StructType(Seq(
          StructField("_v", df.schema(valueCol).dataType),
          StructField("_before", LongType, nullable = false))))
      val wTie = Window.partitionBy(valueCol).orderBy(tieCol)
      val q = total / n
      val r = total - q * n
      val idx = col("_before") + col("_rw") - 1
      return df.withColumn("_rw", row_number().over(wTie).cast("long"))
        .join(broadcast(beforeDf), df(valueCol) <=> col("_v"))
        .withColumn(bucketCol,
          when(idx < r * (q + 1), floor(idx / (q + 1)).cast("long"))
            .otherwise(floor((idx - r * (q + 1)) / q).cast("long") + r) + 1)
        .drop("_v", "_rw", "_before")
    }
    // NULLs form their own coarse range below every real one (NULLS FIRST),
    // keyed by a sentinel so the triangular prefix join counts them into
    // every non-null range's prefix.
    def coarse(c: Column): Column =
      when(c.isNull, lit(Long.MinValue)).otherwise(floor(c / coarseWidth).cast("long"))

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
      .join(before, df(valueCol) <=> col("_v")) // null-safe: NULL rows keep their bucket
      .crossJoin(broadcast(total))
      .withColumn(bucketCol,
        when(idx < r * (q + 1), floor(idx / (q + 1)).cast("long"))
          .otherwise(r + floor((idx - r * (q + 1)) / q).cast("long")) + 1)
      .drop("_v", "_rw", "_before", "_n")
  }
}
