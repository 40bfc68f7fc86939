package graft

import graft.core.Contracts
import graft.etl.{Etl, Flatten}
import org.apache.spark.sql.Row

/** Mirrors the reference's only automated test (tests/test_searches.py):
  * round-trip a canonical search event through validate→flatten→parquet and
  * assert the exact flattened values, including list-typed results__*.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private val goodJson =
    """{"user":{"id":1},"query_id":"123","raw_query":"test",""" +
      """"results":[{"document_id":1,"position":1,"score":1.0}]}"""
  private val badJson = """{"user":{"id":1},"raw_query":"test"}""" // no query_id

  test("searches column paths match the reference CSV layout") {
    assert(Contracts.searches.columnPaths == Seq(
      "timestamp_micros", "user__id", "query_id", "raw_query",
      "results__document_id", "results__position", "results__score"))
  }

  test("canonical event flattens to the reference's expected values") {
    val bronze = Seq((1L, goodJson), (2L, badJson)).toDF("ts", "data")
    val (silver, invalid) = Etl.run(bronze, Contracts.searches)

    val rows = silver.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("user__id") == 1L)
    assert(r.getAs[String]("query_id") == "123")
    assert(r.getAs[String]("raw_query") == "test")
    assert(r.getAs[scala.collection.Seq[Long]]("results__document_id").toSeq == Seq(1L))
    assert(r.getAs[scala.collection.Seq[Long]]("results__position").toSeq == Seq(1L))
    assert(r.getAs[scala.collection.Seq[Double]]("results__score").toSeq == Seq(1.0))
    assert(r.getAs[Long]("timestamp_micros") > 0L) // default injected

    val inv = invalid.collect()
    assert(inv.length == 1)
    val v = inv.head.getAs[scala.collection.Seq[Row]]("_violations")
    assert(v.map(x => (x.getString(0), x.getString(1))).toSeq == Seq(("query_id", "missing")))
  }

  test("silver survives a parquet round trip") {
    val bronze = Seq((1L, goodJson)).toDF("ts", "data")
    val (silver, _) = Etl.run(bronze, Contracts.searches)
    val out = tmpDir("etl") + "/searches"
    Etl.sink(silver, out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Contracts.searches.columnPaths)
    assert(back.select("results__score").as[Seq[Double]].collect().head == Seq(1.0))
  }

  test("sink writes hive-partitioned silver and reads back complete") {
    val bronze = Seq((1L, goodJson), (2L, goodJson)).toDF("ts", "data")
    val (silver, _) = Etl.run(bronze, Contracts.searches)
    val out = tmpDir("etlpart") + "/searches"
    Etl.sink(silver.withColumn("shard", $"user__id" % 2), out, partitionBy = Seq("shard"))
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.columns.contains("shard"))
  }

  test("schema evolution end-to-end: old silver reads under the evolved contract") {
    import org.apache.spark.sql.types._
    // v1 contract writes silver without the (future) results columns
    val v1 = Contracts.clicks
    val bronze1 = Seq((1L, """{"query_id":"q1","document_id":5}""")).toDF("ts", "data")
    val (silver1, _) = Etl.run(bronze1, v1)
    val dir = tmpDir("evolve") + "/clicks"
    Etl.sink(silver1, dir)
    // v2 appends a nested field; stored column list evolves append-only
    val v2schema = new StructType(v1.schema.fields :+
      StructField("referrer", StructType(Seq(StructField("url", StringType)))))
    val evolved = graft.etl.Migrate.evolve(v1.columnPaths, v2schema)
    assert(evolved == v1.columnPaths :+ "referrer__url")
    // old parquet reads under the evolved layout, new column null-filled
    val back = graft.etl.Migrate.readWithColumns(spark, dir, evolved,
      Map("referrer__url" -> StringType))
    assert(back.columns.toSeq == evolved)
    val row = back.collect().head
    assert(row.getAs[String]("query_id") == "q1" && row.isNullAt(evolved.size - 1))
    // and a v2 bronze row flattens with the new column populated
    val v2 = v1.copy(schema = v2schema)
    val bronze2 = Seq((2L,
      """{"query_id":"q2","document_id":6,"referrer":{"url":"http://x"}}""")).toDF("ts", "data")
    val (silver2, _) = Etl.run(bronze2, v2, Some(evolved))
    assert(silver2.columns.toSeq == evolved)
    assert(silver2.select("referrer__url").as[String].collect().head == "http://x")
  }

  test("bronze JSON-lines file source feeds the same ETL") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("bronze")
    Files.writeString(Paths.get(dir, "log.jsonl"),
      s"""{"ts": 1, "data": ${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(goodJson)}}\n""")
    val bronze = graft.etl.Sources.bronzeJson(spark, dir)
    val (silver, invalid) = Etl.run(bronze, Contracts.searches)
    assert(silver.count() == 1 && invalid.count() == 0)
    assert(silver.select("query_id").as[String].collect().head == "123")
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the in-memory catalog forgets tables across JVMs but their warehouse
      // dirs persist; clear both so saveAsTable(Overwrite) starts clean
      for (t <- Seq("b_facts", "b_dims")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("key", "v")
      val dims = (0 to 49).map(i => (i.toLong, s"d$i")).toDF("key", "name")
      Etl.sinkBucketed(facts, "b_facts", "key", 8)
      Etl.sinkBucketed(dims, "b_dims", "key", 8)
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "key")
      assert(joined.count() == 1000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"), finalPlan)
      assert(!finalPlan.contains("Exchange hashpartitioning"), finalPlan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed_join_agg gate query plans with zero Exchange of any kind") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = SparkEntry.queries("bucketed_join_agg")(spark, "/root/testdata/sf0.001")
      assert(q.count() > 0)
      val plan = q.queryExecution.executedPlan.toString
      // join AND final aggregate both reuse the bucket partitioning: no
      // shuffle exchange, no broadcast exchange anywhere in the plan
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("malformed JSON routes to the invalid side with its raw payload intact") {
    val bronze = Seq((1L, "{not json"), (2L, goodJson)).toDF("ts", "data")
    val (silver, invalid) = Etl.run(bronze, Contracts.searches)
    assert(silver.count() == 1)
    val inv = invalid.select("data").as[String].collect().toSeq
    assert(inv == Seq("{not json")) // quarantine preserves the original bytes
  }

  test("z-ordered sink: per-file min/max become near-disjoint on BOTH dimensions") {
    // 64×64 grid, a and b independent — the worst case for single-column
    // sorting (sorting by a leaves b's per-file range at full width) and
    // exactly what z-ordering is for.
    val df = spark.range(4096).select(
      (org.apache.spark.sql.functions.col("id") % 64).cast("double").as("a"),
      (org.apache.spark.sql.functions.col("id") / 64).cast("double").as("b"))
    def fileWidths(dir: String, c: String): Seq[Double] =
      spark.read.parquet(dir).inputFiles.toSeq.map { f =>
        val r = spark.read.parquet(f)
          .agg(org.apache.spark.sql.functions.min(c),
            org.apache.spark.sql.functions.max(c)).collect().head
        r.getDouble(1) - r.getDouble(0)
      }
    val zDir = tmpDir("zord"); val rrDir = tmpDir("rr")
    Etl.sinkZOrdered(df, zDir, Seq("a", "b"), numFiles = 8)
    df.repartition(8).write.mode("overwrite").parquet(rrDir) // round-robin
    // round trip: layout changes bytes on disk, never the relation
    assert(spark.read.parquet(zDir).count() == 4096)
    assert(spark.read.parquet(zDir).agg(
      org.apache.spark.sql.functions.sum("a"),
      org.apache.spark.sql.functions.sum("b")).collect().head ==
      df.agg(org.apache.spark.sql.functions.sum("a"),
        org.apache.spark.sql.functions.sum("b")).collect().head)
    // every round-robin file spans ~the full domain of both columns; the
    // z-ordered files cover a fraction — min/max pruning on EITHER column
    // now skips most files (8 files over 3 top morton bits: a splits ≥2×,
    // b ≥2× — assert a conservative 30% total-width cut on both)
    for (c <- Seq("a", "b")) {
      val z = fileWidths(zDir, c).sum
      val rr = fileWidths(rrDir, c).sum
      assert(z < 0.7 * rr, s"$c: z-order widths $z vs round-robin $rr")
    }
  }

  test("z-ordered layout actually prunes: scan metrics on EVERY dimension") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    // Vanilla Spark has no file-level data-skipping index; the pruning a
    // z-ordered layout buys happens in the parquet reader, which drops
    // whole row groups whose min/max exclude the pushed filter. So the
    // observable is the SCAN's numOutputRows (rows the reader actually
    // materialized, pre-Filter): near-disjoint per-file stats ⇒ most row
    // groups skipped ⇒ the scan emits a fraction of the table.
    val df = spark.range(4096).select(
      (col("id") % 64).cast("double").as("a"),
      org.apache.spark.sql.functions.floor(col("id") / 64)
        .cast("double").as("b"))
    val zDir = tmpDir("zprune"); val rrDir = tmpDir("rrprune")
    Etl.sinkZOrdered(df, zDir, Seq("a", "b"), numFiles = 32)
    df.repartition(32).write.mode("overwrite").parquet(rrDir)
    def scanned(dir: String, c: String): Long = {
      val q = spark.read.parquet(dir).where(col(c) === 3.0)
      assert(q.collect().length == 64) // the filter's answer is unchanged
      val scan = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s }
      assert(scan.nonEmpty, "expected a FileSourceScanExec leaf")
      // the predicate must be IN the scan for stats skipping to exist
      assert(scan.head.metadata("PushedFilters").contains("EqualTo"),
        scan.head.metadata("PushedFilters"))
      scan.head.metrics("numOutputRows").value
    }
    for (c <- Seq("a", "b")) {
      val rr = scanned(rrDir, c)
      val z = scanned(zDir, c)
      // round-robin: nearly every row group spans the full domain of both
      // columns (a scattered 128-row file misses a given 1-in-64 value only
      // by luck), so most of the table is read. z-order: 32 files over 5
      // top morton bits give each file a fraction of each domain — most
      // row groups are skipped by stats alone.
      assert(rr >= 3000L, s"$c: round-robin should scan most rows, got $rr")
      assert(z <= rr / 2, s"$c: z-ordered scan read $z of $rr rows")
    }
  }

  test("small-file compaction: fewer files, identical relation, layouts preserved") {
    import org.apache.spark.sql.functions.col
    // plain table: 64 tiny files → a handful
    val df = spark.range(10000).select(col("id"),
      (col("id") % 7).as("k"), (col("id") % 3).cast("string").as("p"))
    val dir = tmpDir("compact")
    df.repartition(64).write.mode("overwrite").parquet(dir)
    val sumBefore = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.sum("id")).collect().head.getLong(0)
    val (before, after) = Etl.compactFiles(spark, dir, targetFileBytes = 1L << 20)
    assert(before == 64L && after < 8L, s"$before -> $after")
    val rd = spark.read.parquet(dir)
    assert(rd.count() == 10000 &&
      rd.agg(org.apache.spark.sql.functions.sum("id")).collect().head.getLong(0) == sumBefore)
    // hive-partitioned: compaction stays within partition dirs
    val pdir = tmpDir("compactp")
    df.repartition(16).write.mode("overwrite").partitionBy("p").parquet(pdir)
    val (pb, pa) = Etl.compactFiles(spark, pdir, targetFileBytes = 1L << 20,
      partitionCols = Seq("p"))
    assert(pb == 48L && pa <= 6L, s"$pb -> $pa") // 16 files × 3 partition dirs
    val prd = spark.read.parquet(pdir)
    assert(prd.count() == 10000 && prd.select("p").distinct().count() == 3)
    assert(new java.io.File(pdir).listFiles().map(_.getName).count(_.startsWith("p=")) == 3)
    // sorted compaction preserves clustering: per-file ranges stay disjoint
    val zdir = tmpDir("compactz")
    df.repartition(32).write.mode("overwrite").parquet(zdir)
    val (_, za) = Etl.compactFiles(spark, zdir, targetFileBytes = 64L << 10,
      sortCols = Seq("id"))
    assert(za >= 2L, "need >1 file to check range disjointness")
    val ranges = spark.read.parquet(zdir).inputFiles.toSeq.map { f =>
      val r = spark.read.parquet(f).agg(
        org.apache.spark.sql.functions.min("id"),
        org.apache.spark.sql.functions.max("id")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $ranges")
      case _ =>
    }
  }

  test("compaction recovery: aside restored; lone complete __compacting promoted") {
    import org.apache.spark.sql.functions.col
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = hp("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.range(500).select(col("id"))
    // crash between rename 1 and 2: canonical absent, aside present → the
    // aside (original data) is restored and the stale tmp dropped.
    val d1 = tmpDir("recover1")
    df.write.mode("overwrite").parquet(d1)
    df.write.mode("overwrite").parquet(d1 + "__compacting")
    assert(fs.rename(hp(d1), hp(d1 + "__precompact")))
    assert(Etl.recoverCompaction(spark, d1))
    assert(spark.read.parquet(d1).count() == 500)
    assert(!fs.exists(hp(d1 + "__precompact")) && !fs.exists(hp(d1 + "__compacting")))
    // canonical and aside both gone, a COMPLETE (_SUCCESS-marked) compacted
    // copy remains: it is the last copy of the data — recovery must promote
    // it, never delete it.
    val d2 = tmpDir("recover2")
    fs.delete(hp(d2), true) // tmpDir pre-creates an empty dir; the crash scenario has NO canonical path
    df.write.mode("overwrite").parquet(d2 + "__compacting")
    assert(fs.exists(hp(d2 + "__compacting/_SUCCESS")))
    assert(Etl.recoverCompaction(spark, d2))
    assert(spark.read.parquet(d2).count() == 500)
    assert(!fs.exists(hp(d2 + "__compacting")))
    // an INCOMPLETE tmp (no _SUCCESS) with no other copy is left untouched
    // for manual inspection — recovery refuses to guess.
    val d3 = tmpDir("recover3")
    fs.delete(hp(d3), true)
    df.write.mode("overwrite").parquet(d3 + "__compacting")
    fs.delete(hp(d3 + "__compacting/_SUCCESS"), false)
    assert(!Etl.recoverCompaction(spark, d3))
    assert(fs.exists(hp(d3 + "__compacting")))
    // idempotent no-op on a healthy table
    val d4 = tmpDir("recover4")
    df.write.mode("overwrite").parquet(d4)
    assert(!Etl.recoverCompaction(spark, d4))
    assert(spark.read.parquet(d4).count() == 500)
  }

  test("snapshot zone-map: manifest prunes files, probe equals plain filter") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val path = tmpDir("snap") + "/snap"
    graft.core.Snapshot.write(df, path, "k", nFiles = 10)
    val man = graft.core.Snapshot.manifest(spark, path)
    // range partitioner boundaries come from sampling — all 10 partitions
    // should be populated here, but only multiplicity matters to pruning
    assert(man.size > 5 && man.size <= 10 && man.map(_.rows).sum == 1000L)
    // files own disjoint bands after range clustering
    val sorted = man.sortBy(_.min)
    assert(sorted.sliding(2).forall {
      case Seq(a, b) => a.max < b.min; case _ => true })
    // a narrow probe schedules a strict subset of the files
    val files = graft.core.Snapshot.selectFiles(spark, path, 250L, 349L)
    assert(files.nonEmpty && files.size < man.size)
    val got = graft.core.Snapshot.scan(spark, path, "k", 250L, 349L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == (250L to 349L).map(i => (i, s"v$i")))
    // a probe beyond the domain reads nothing and returns nothing
    assert(graft.core.Snapshot.selectFiles(spark, path, 5000L, 6000L).isEmpty)
    assert(graft.core.Snapshot.scan(spark, path, "k", 5000L, 6000L)
      .count() == 0L)
  }

  test("snapshot append: O(batch) increment, time travel, history pruned not rescanned") {
    import spark.implicits._
    val hist = (0L until 500L).map(i => (i, s"h$i")).toDF("k", "v")
    val batch = (500L until 700L).map(i => (i, s"b$i")).toDF("k", "v")
    val path = tmpDir("snapincr") + "/s"
    graft.core.Snapshot.write(hist, path, "k", nFiles = 5)
    val m1 = graft.core.Snapshot.manifest(spark, path)
    graft.core.Snapshot.append(batch, path, "k", nFiles = 2)
    val m2 = graft.core.Snapshot.manifest(spark, path)
    // history manifest rows carry over VERBATIM — the files were not
    // rewritten or rescanned; only the increment's rows are new
    assert(m2.toSet.intersect(m1.toSet) == m1.toSet)
    assert(m2.map(_.rows).sum == 700L && m1.map(_.rows).sum == 500L)
    // current version sees history ∪ batch
    val cur = graft.core.Snapshot.scan(spark, path, "k", 450L, 549L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(cur == (450L to 499L).map(i => (i, s"h$i")) ++
      (500L to 549L).map(i => (i, s"b$i")))
    // time travel: version 1 still reads as pre-append state
    val old = graft.core.Snapshot.scan(spark, path, "k", 450L, 549L,
      version = Some(1)).orderBy("k").as[(Long, String)].collect().toSeq
    assert(old == (450L to 499L).map(i => (i, s"h$i")))
    // a probe inside the increment's band alone skips every history file
    val incFiles = graft.core.Snapshot.selectFiles(spark, path, 600L, 699L)
    assert(incFiles.nonEmpty &&
      incFiles.toSet.intersect(m1.map(_.file).toSet).isEmpty)
    // the version log reads both commits
    val log = graft.core.Snapshot.history(spark, path)
    assert(log.map(h => (h._1, h._3)) == Seq((1, 500L), (2, 700L)))
  }

  test("snapshot delete: copy-on-write rewrites only overlapping files") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val path = tmpDir("snapdel") + "/s"
    graft.core.Snapshot.write(df, path, "k", nFiles = 10)
    val m1 = graft.core.Snapshot.manifest(spark, path)
    graft.core.Snapshot.delete(spark, path, "k", 250L, 349L)
    val m2 = graft.core.Snapshot.manifest(spark, path)
    // non-overlapping manifest rows carry over VERBATIM (files untouched)
    val untouched = m1.filter(s => s.max < 250L || s.min > 349L)
    assert(untouched.nonEmpty && untouched.forall(m2.contains))
    // overlapping originals are gone from the new version
    val hit = m1.filterNot(untouched.contains)
    assert(hit.nonEmpty && hit.forall(s => !m2.contains(s)))
    assert(m2.map(_.rows).sum == 900L)
    // deleted band gone; neighbours inside rewritten files survive
    val got = graft.core.Snapshot.scan(spark, path, "k", 200L, 399L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == ((200L to 249L) ++ (350L to 399L)).map(i => (i, s"v$i")))
    // time travel: version 1 still holds the pre-delete rows
    assert(graft.core.Snapshot.scan(spark, path, "k", 250L, 349L,
      version = Some(1)).count() == 100L)
    // a no-overlap delete is a pure metadata commit
    graft.core.Snapshot.delete(spark, path, "k", 5000L, 6000L)
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 900L)
  }

  test("snapshot compaction: fewer files, identical rows, clustering restored") {
    import spark.implicits._
    val path = tmpDir("snapcomp") + "/s"
    graft.core.Snapshot.write(
      (0L until 300L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k", 6)
    graft.core.Snapshot.append(
      (300L until 400L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k", 4)
    graft.core.Snapshot.append(
      (400L until 500L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k", 4)
    val before = graft.core.Snapshot.manifest(spark, path)
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 4)
    val after = graft.core.Snapshot.manifest(spark, path)
    assert(after.size < before.size && after.map(_.rows).sum == 500L)
    // bands disjoint again after compaction
    val sorted = after.sortBy(_.min)
    assert(sorted.sliding(2).forall {
      case Seq(a, b) => a.max < b.min; case _ => true })
    // identical relation through any probe
    val got = graft.core.Snapshot.scan(spark, path, "k", 0L, 499L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == (0L until 500L).map(i => (i, s"v$i")))
    // pre-compaction version still readable
    assert(graft.core.Snapshot.manifest(spark, path, Some(3)) == before)
  }

  test("snapshot streaming ingest: foreachBatch appends, batch replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("snapstream") + "/s"
    // initialize the table (schema + v1) from an empty relation
    graft.core.Snapshot.write(Seq.empty[(Long, String)].toDF("k", "v"),
      path, "k", nFiles = 1)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.core.Snapshot.appendBatch(df, path, "k", id, nFiles = 2))
      .option("checkpointLocation", tmpDir("snapstreamckpt"))
      .start()
    try {
      input.addData((0L until 50L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      input.addData((50L until 80L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 80L)
    // the foreachBatch retry contract: re-delivery of the LAST batch id
    // must not duplicate (this is exactly what a post-crash restart does)
    graft.core.Snapshot.appendBatch(
      (50L until 80L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      batchId = 1L, nFiles = 2)
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 80L)
    // a genuinely new batch id still appends
    graft.core.Snapshot.appendBatch(
      (80L until 90L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      batchId = 2L, nFiles = 1)
    val got = graft.core.Snapshot.scan(spark, path, "k", 0L, 99L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == (0L until 90L).map(i => (i, s"v$i")))
  }

  test("snapshot batch replay is detected across interleaved commits") {
    import spark.implicits._
    val path = tmpDir("snapinterleave") + "/s"
    graft.core.Snapshot.write(
      (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 2)
    // batch 7 commits...
    graft.core.Snapshot.appendBatch(
      (20L until 30L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      batchId = 7L, nFiles = 1)
    // ...then a NON-streaming commit interleaves before the redelivery
    // (exactly the window where a marker-of-current-version-only check
    // would miss the replay and double-append)
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 2)
    graft.core.Snapshot.appendBatch(
      (20L until 30L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      batchId = 7L, nFiles = 1)
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 30L)
    // a genuinely new batch id still appends after the interleave
    graft.core.Snapshot.appendBatch(
      (30L until 35L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      batchId = 8L, nFiles = 1)
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 35L)
  }

  test("snapshot commit fails fast on NULL statCol rows") {
    import spark.implicits._
    val path = tmpDir("snapnullstat") + "/s"
    val bad = Seq((Some(1L), "a"), (None: Option[Long], "b"))
      .toDF("k", "v")
    val err = intercept[IllegalArgumentException] {
      graft.core.Snapshot.write(bad, path, "k", nFiles = 1)
    }
    assert(err.getMessage.contains("NULL"))
    // and on append into a healthy table
    graft.core.Snapshot.write(Seq((1L, "a")).toDF("k", "v"), path, "k",
      nFiles = 1)
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.append(bad, path, "k", nFiles = 1)
    }
    // the failed append never committed: table still reads v1 intact
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 1L)
    // CREATE OR REPLACE is transactional: a failing REPLACE (null
    // statCol again) leaves the previous table fully readable
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.write(bad, path, "k", nFiles = 1)
    }
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 99L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("snapshot concurrent evolving appends compose to the field union") {
    import spark.implicits._
    val path = tmpDir("snapevolverace") + "/s"
    graft.core.Snapshot.write(
      (0L until 4L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    // two racing appends, each ADDING its own column: whichever commits
    // second must re-evolve against the winner's schema, so the final
    // schema is the UNION (k, v, x, y) — not the last writer's view
    val ta = new Thread(() => graft.core.Snapshot.append(
      Seq((10L, "v10", 7L)).toDF("k", "v", "x"), path, "k", nFiles = 1))
    val tb = new Thread(() => graft.core.Snapshot.append(
      Seq((20L, "v20", "en")).toDF("k", "v", "y"), path, "k", nFiles = 1))
    ta.start(); tb.start(); ta.join(); tb.join()
    val head = graft.core.Snapshot.scan(spark, path, "k", 0L, 99L)
    assert(head.schema.fieldNames.toSet == Set("k", "v", "x", "y"))
    // field ORDER depends on which append won the race — the union is
    // the contract, so select in a fixed order for the readout
    val rows = head.select("k", "v", "x", "y").orderBy("k")
      .as[(Long, String, Option[Long], Option[String])].collect().toSeq
    assert(rows.take(4) == (0L until 4L).map(i => (i, s"v$i", None, None)))
    assert(rows.contains((10L, "v10", Some(7L), None)))
    assert(rows.contains((20L, "v20", None, Some("en"))))
  }

  test("snapshot streaming appendBatch enforces the append-only schema contract") {
    import spark.implicits._
    val path = tmpDir("snapbatchschema") + "/s"
    graft.core.Snapshot.write(
      Seq((1L, "a", "en")).toDF("k", "v", "lang"), path, "k", nFiles = 1)
    // a batch MISSING a stored column fails loudly instead of silently
    // null-filling the column for the whole batch
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.appendBatch(Seq((2L, "b")).toDF("k", "v"),
        path, "k", batchId = 1L, nFiles = 1)
    }
    // a batch ADDING a column evolves the schema like append does
    graft.core.Snapshot.appendBatch(
      Seq((3L, "c", "fr", 9L)).toDF("k", "v", "lang", "score"),
      path, "k", batchId = 2L, nFiles = 1)
    val head = graft.core.Snapshot.scan(spark, path, "k", 0L, 99L)
      .orderBy("k").as[(Long, String, String, Option[Long])].collect().toSeq
    assert(head == Seq((1L, "a", "en", None), (3L, "c", "fr", Some(9L))))
  }

  test("snapshot schema evolution: add column null-fills old files, time travel keeps the old shape") {
    import spark.implicits._
    val path = tmpDir("snapevolve") + "/s"
    graft.core.Snapshot.write(
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 2)
    // the evolving append: same columns plus a trailing lang
    graft.core.Snapshot.append(
      (10L until 15L).map(i => (i, s"v$i", "en")).toDF("k", "v", "lang"),
      path, "k", nFiles = 1)
    val head = graft.core.Snapshot.scan(spark, path, "k", 0L, 99L)
      .orderBy("k").as[(Long, String, Option[String])].collect().toSeq
    assert(head == (0L until 10L).map(i => (i, s"v$i", None)) ++
      (10L until 15L).map(i => (i, s"v$i", Some("en"))))
    // time travel below the evolution: the ORIGINAL two-column shape
    val v1 = graft.core.Snapshot.scan(spark, path, "k", 0L, 99L,
      version = Some(1))
    assert(v1.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(v1.count() == 10L)
    // a second append WITHOUT the new column is itself an (illegal)
    // drop — append-only means the schema never shrinks
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.append(Seq((99L, "x")).toDF("k", "v"), path, "k",
        nFiles = 1)
    }
    // retyping a stored column is rejected too
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.append(
        Seq((99L, 1.0, "en")).toDF("k", "v", "lang"), path, "k", nFiles = 1)
    }
    // neither failed append committed anything
    assert(graft.core.Snapshot.manifest(spark, path).map(_.rows).sum == 15L)
  }

  test("snapshot optimistic concurrency: interleaved appends both survive; a crashed commit is invisible") {
    import spark.implicits._
    val path = tmpDir("snapconc") + "/s"
    graft.core.Snapshot.write(
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    // two appends racing from separate threads: the commit protocol
    // must serialize them onto consecutive versions with BOTH deltas
    // in the final manifest (no lost update)
    val t1 = new Thread(() => graft.core.Snapshot.append(
      (10L until 20L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1))
    val t2 = new Thread(() => graft.core.Snapshot.append(
      (20L until 30L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1))
    t1.start(); t2.start(); t1.join(); t2.join()
    val hist = graft.core.Snapshot.history(spark, path)
    assert(hist.map(_._1) == Seq(1, 2, 3) && hist.last._3 == 30L)
    val got = graft.core.Snapshot.scan(spark, path, "k", 0L, 99L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == (0L until 30L).map(i => (i, s"v$i")))
    // crash-between-stage-and-commit-marker: a writer that died after
    // staging its manifest (but before the _commit marker) left v4
    // metadata unreferenced — the table still reads v3, and the next
    // real append commits v4 without seeing the orphan's rows (staged
    // files are writer-unique, so nothing can collide with them)
    val orphan = new java.io.File(path, "_staged/manifest.v4.deadbeef.tsv")
    java.nio.file.Files.writeString(orphan.toPath,
      "file:/nonexistent/orphan.parquet\t0\t0\t999\n")
    assert(graft.core.Snapshot.history(spark, path).map(_._1).max == 3)
    graft.core.Snapshot.append(
      (30L until 32L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    val m4 = graft.core.Snapshot.manifest(spark, path, Some(4))
    assert(m4.map(_.rows).sum == 32L && !m4.exists(_.file.contains("orphan")))
  }

  test("snapshot multi-column zone maps: secondary bands prune files, result is the plain filter") {
    import spark.implicits._
    // k clustered; w correlated (w = 3k) so secondary bands are tight;
    // u null below k=200 so one whole band has no non-null u values
    val df = (0L until 1000L).map(i =>
        (i, i * 3, if (i < 200) None else Some(i + 5000), s"r$i"))
      .toDF("k", "w", "u", "v")
    val path = tmpDir("snapmulti") + "/s"
    graft.core.Snapshot.write(df, path, "k", nFiles = 10,
      statCols2 = Seq("w", "u"))
    val total = graft.core.Snapshot.manifest(spark, path).size
    // a 10% probe on the SECONDARY column w must schedule ~10% of files
    val wFiles = graft.core.Snapshot
      .selectFilesBy(spark, path, "w", 300L, 597L).size
    assert(wFiles <= math.max(2, total / 5),
      s"w probe read $wFiles of $total files")
    val got = graft.core.Snapshot.scanBy(spark, path, "w", 300L, 597L)
      .orderBy("k").as[(Long, Long, Option[Long], String)].collect()
    assert(got.toSeq == (100L to 199L).map(i =>
      (i, i * 3, None, s"r$i")))
    // files with NO non-null u values prune away for every u probe, and
    // null-u rows never leak into a u range result
    val uGot = graft.core.Snapshot.scanBy(spark, path, "u", 5000L, 5299L)
      .orderBy("k").as[(Long, Long, Option[Long], String)].collect()
    assert(uGot.toSeq == (200L to 299L).map(i =>
      (i, i * 3, Some(i + 5000), s"r$i")))
    val uFiles = graft.core.Snapshot
      .selectFilesBy(spark, path, "u", 5000L, 5299L).size
    assert(uFiles <= math.max(2, total / 5),
      s"u probe read $uFiles of $total files")
    // a probe on an UNREGISTERED column is a loud error, never a
    // silently partial result pruned with the wrong column's bands
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.scanBy(spark, path, "v", 0L, 10L).count()
    }
    // secondaries persist through append and compact commits
    graft.core.Snapshot.append(
      Seq((1000L, 3000L, Some(6000L), "r1000")).toDF("k", "w", "u", "v"),
      path, "k", nFiles = 1)
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 4)
    val after = graft.core.Snapshot.scanBy(spark, path, "w", 3000L, 3000L)
      .as[(Long, Long, Option[Long], String)].collect()
    assert(after.toSeq == Seq((1000L, 3000L, Some(6000L), "r1000")))
    assert(graft.core.Snapshot.manifest(spark, path)
      .forall(_.extra.size == 2))
  }

  test("snapshot merge: key-replace upsert rewrites only matched files") {
    import spark.implicits._
    val path = tmpDir("snapmerge") + "/s"
    // keys 0..99, two rows per key, 10 files → disjoint 20-key bands
    val df = (0L until 100L).flatMap(k =>
      Seq((k, 1L, s"a$k"), (k, 2L, s"b$k"))).toDF("k", "ln", "v")
    graft.core.Snapshot.write(df, path, "k", nFiles = 10)
    val before = graft.core.Snapshot.manifest(spark, path)
    // replace keys 40..44 (three rows now, not two) + insert key 200
    val batch = ((40L until 45L).flatMap(k =>
      Seq((k, 1L, s"A$k"), (k, 2L, s"B$k"), (k, 3L, s"C$k"))) :+
      ((200L, 1L, "new"))).toDF("k", "ln", "v")
    graft.core.Snapshot.merge(batch, path, "k", nFiles = 1)
    val after = graft.core.Snapshot.manifest(spark, path)
    // untouched files carried VERBATIM (manifest rows identical)
    val carried = before.map(_.file).toSet
      .intersect(after.map(_.file).toSet)
    assert(carried.size >= 8,
      s"merge rewrote too much: ${carried.size} of ${before.size} carried")
    // key-replace semantics: old rows for matched keys are gone, the
    // batch's rows (even with different multiplicity) stand in; the
    // insert landed; everything else untouched
    val got = graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .orderBy("k", "ln").as[(Long, Long, String)].collect().toSeq
    val expected = ((0L until 100L).filterNot(k => k >= 40 && k < 45)
      .flatMap(k => Seq((k, 1L, s"a$k"), (k, 2L, s"b$k"))) ++
      (40L until 45L).flatMap(k =>
        Seq((k, 1L, s"A$k"), (k, 2L, s"B$k"), (k, 3L, s"C$k"))) :+
      ((200L, 1L, "new"))).sortBy(r => (r._1, r._2))
    assert(got == expected)
    // a merge whose keys match nothing is a pure insert: zero rewrites
    val b2 = graft.core.Snapshot.manifest(spark, path)
    graft.core.Snapshot.merge(Seq((300L, 1L, "x")).toDF("k", "ln", "v"),
      path, "k", nFiles = 1)
    val a2 = graft.core.Snapshot.manifest(spark, path)
    assert(b2.map(_.file).toSet.subsetOf(a2.map(_.file).toSet))
    // pre-merge version still readable (time travel)
    assert(graft.core.Snapshot.scan(spark, path, "k", 40L, 44L,
      version = Some(1)).count() == 10L)
  }

  test("snapshot metadata count: fully-covered files never scan") {
    import spark.implicits._
    val path = tmpDir("snapcount") + "/s"
    graft.core.Snapshot.write(
      (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 10)
    // whole-table count: every file fully covered → metadata only
    val whole = graft.core.Snapshot.countRange(spark, path, "k", 0L, 9999L)
    assert(!whole.queryExecution.executedPlan.toString.contains("parquet"),
      "whole-range count scanned data files")
    assert(whole.as[Long].head() == 1000L)
    // boundary-straddling range: correct count, and only the straddling
    // files scan (the plan reads parquet but the value is exact)
    val part = graft.core.Snapshot.countRange(spark, path, "k", 150L, 849L)
    assert(part.as[Long].head() == 700L)
    // degenerate: a range hitting nothing
    assert(graft.core.Snapshot.countRange(spark, path, "k", 5000L, 6000L)
      .as[Long].head() == 0L)
  }

  test("snapshot bloom sidecar: equality probes prune files, lookups are exact") {
    import spark.implicits._
    val path = tmpDir("snapbloom") + "/s"
    // clustered on k; uid is a string the clustering cannot help with
    val df = (0L until 1000L).map(i => (i, s"u$i", s"v$i"))
      .toDF("k", "uid", "v")
    graft.core.Snapshot.write(df, path, "k", nFiles = 16,
      bloomCol = Some("uid"))
    val total = graft.core.Snapshot.manifest(spark, path).size
    // each present uid is FOUND (blooms have no false negatives) and
    // reads a small fraction of files
    Seq(0L, 123L, 777L, 999L).foreach { i =>
      val files = graft.core.Snapshot.selectFilesEq(spark, path, s"u$i")
      assert(files.nonEmpty && files.size <= math.max(2, total / 4),
        s"u$i read ${files.size} of $total files")
      val row = graft.core.Snapshot.lookupEq(spark, path, s"u$i")
        .as[(Long, String, String)].collect().toSeq
      assert(row == Seq((i, s"u$i", s"v$i")))
    }
    // an absent uid returns nothing (false positives may scan a file,
    // but the residual filter drops every row)
    assert(graft.core.Snapshot.lookupEq(spark, path, "u12345").count() == 0L)
    // the sidecar follows appends: a new batch's uid is found afterward
    graft.core.Snapshot.append(
      Seq((2000L, "u2000", "v2000")).toDF("k", "uid", "v"), path, "k",
      nFiles = 1)
    assert(graft.core.Snapshot.lookupEq(spark, path, "u2000")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((2000L, "u2000", "v2000")))
    // ...and compaction rebuilds it for the folded files
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 4)
    assert(graft.core.Snapshot.lookupEq(spark, path, "u123")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((123L, "u123", "v123")))
  }

  test("snapshot vacuum: expired versions and orphaned files reclaimed, retained window intact") {
    import spark.implicits._
    val path = tmpDir("snapvacuum") + "/s"
    graft.core.Snapshot.write(
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 4)
    graft.core.Snapshot.append(
      (100L until 150L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 2)
    graft.core.Snapshot.delete(spark, path, "k", 0L, 49L)
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 2)
    // plus a crashed commit's orphans: a data dir no manifest references
    val orphanDir = new java.io.File(path, "dorphan123")
    orphanDir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(orphanDir, "part-0.parquet").toPath, "junk")
    assert(graft.core.Snapshot.history(spark, path).map(_._1) ==
      Seq(1, 2, 3, 4))
    val (expired, dropped) =
      graft.core.Snapshot.vacuum(spark, path, keepVersions = 2)
    assert(expired == 2 && dropped > 0)
    // retained window reads exactly as before the vacuum
    assert(graft.core.Snapshot.history(spark, path).map(_._1) == Seq(3, 4))
    val got = graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == (50L until 150L).map(i => (i, s"v$i")))
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L,
      version = Some(3)).count() == 100L)
    // the orphan dir is gone; expired manifests error clearly
    assert(!orphanDir.exists())
    intercept[Exception] {
      graft.core.Snapshot.manifest(spark, path, Some(1))
    }
    // every file still on disk is referenced by a retained manifest
    val live = (Seq(3, 4)).flatMap(v =>
      graft.core.Snapshot.manifest(spark, path, Some(v)))
      .map(s => new org.apache.hadoop.fs.Path(s.file).toUri.getPath).toSet
    val onDisk = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("d"))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
    assert(onDisk.nonEmpty && onDisk.forall(live))
    // the table keeps working after vacuum: append + probe
    graft.core.Snapshot.append(
      Seq((500L, "v500")).toDF("k", "v"), path, "k", nFiles = 1)
    assert(graft.core.Snapshot.scan(spark, path, "k", 500L, 500L)
      .count() == 1L)
    // a later vacuum with a LARGER retention doesn't resurrect or trip
    // over already-expired versions
    val (expired2, _) = graft.core.Snapshot.vacuum(spark, path,
      keepVersions = 10)
    assert(expired2 == 0)
    assert(graft.core.Snapshot.history(spark, path).map(_._1) == Seq(3, 4, 5))
  }

  test("snapshot changes: incremental read returns exactly the appended rows") {
    import spark.implicits._
    val path = tmpDir("snapchanges") + "/s"
    graft.core.Snapshot.write(
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 2)
    graft.core.Snapshot.append(
      (10L until 25L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 2)
    graft.core.Snapshot.append(
      (25L until 30L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    // each window returns exactly its appended rows
    assert(graft.core.Snapshot.changes(spark, path, 1, 2)
      .orderBy("k").as[(Long, String)].collect().toSeq ==
      (10L until 25L).map(i => (i, s"v$i")))
    assert(graft.core.Snapshot.changes(spark, path, 2, 3)
      .orderBy("k").as[(Long, String)].collect().toSeq ==
      (25L until 30L).map(i => (i, s"v$i")))
    // spanning window = union of increments; empty window = no rows
    assert(graft.core.Snapshot.changes(spark, path, 1, 3).count() == 20L)
    assert(graft.core.Snapshot.changes(spark, path, 3, 3).count() == 0L)
    // bootstrap: fromV = 0 reads everything through toV (v1 included)
    assert(graft.core.Snapshot.changes(spark, path, 0, 1).count() == 10L)
    assert(graft.core.Snapshot.changes(spark, path, 0, 3).count() == 30L)
    // an evolving append's increment reads under the evolved schema
    graft.core.Snapshot.append(
      Seq((30L, "v30", "en")).toDF("k", "v", "lang"), path, "k", nFiles = 1)
    val evolved = graft.core.Snapshot.changes(spark, path, 3, 4)
    assert(evolved.schema.fieldNames.toSeq == Seq("k", "v", "lang"))
    assert(evolved.as[(Long, String, String)].collect().toSeq ==
      Seq((30L, "v30", "en")))
  }

  test("snapshot DSv2 connector: plain spark.read filters become manifest pruning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name}
    val path = tmpDir("snapdsv2") + "/s"
    val df = (0L until 1000L).map(i => (i, i * 3, s"u$i", s"v$i"))
      .toDF("k", "w", "uid", "v")
    graft.core.Snapshot.write(df, path, "k", nFiles = 10,
      statCols2 = Seq("w"), bloomCol = Some("uid"))
    val t = spark.read.format("graft-snapshot").load(path)
    // a plain WHERE on the cluster key: result == filter, and the scan
    // reads only the overlapping files (checked via the files the rows
    // actually came from)
    val probe = t.where(col("k") >= 100 && col("k") <= 199)
    assert(probe.orderBy("k").as[(Long, Long, String, String)]
      .collect().toSeq ==
      (100L to 199L).map(i => (i, i * 3, s"u$i", s"v$i")))
    val filesRead = probe.select(input_file_name()).distinct().count()
    assert(filesRead <= 2L, s"read $filesRead files for a 10% probe")
    // a SECONDARY-column range prunes too
    val wProbe = t.where(col("w") >= 300 && col("w") <= 597)
    assert(wProbe.count() == 100L)
    assert(wProbe.select(input_file_name()).distinct().count() <= 2L)
    // bloom-column equality prunes to ~1 file and returns the exact row
    val uProbe = t.where(col("uid") === "u777")
    assert(uProbe.as[(Long, Long, String, String)].collect().toSeq ==
      Seq((777L, 2331L, "u777", "v777")))
    assert(uProbe.select(input_file_name()).distinct().count() <= 2L)
    // column pruning reaches the parquet reader through the delegate:
    // the scan node's OUTPUT carries only k (the wrapper hides the
    // delegate's ReadSchema line, so assert on the attributes)
    val plan = probe.select("k").queryExecution.executedPlan.toString
    assert("BatchScan[^\\[]*\\[k#\\d+L\\]".r.findFirstIn(plan).isDefined,
      plan)
    // time travel through the option: version 1 before an append
    graft.core.Snapshot.append(
      Seq((5000L, 1L, "u5000", "x")).toDF("k", "w", "uid", "v"),
      path, "k", nFiles = 1)
    assert(spark.read.format("graft-snapshot").load(path).count() == 1001L)
    assert(spark.read.format("graft-snapshot").option("version", 1)
      .load(path).count() == 1000L)
    // an unregistered-column filter stays residual-only: correct rows
    assert(t.where(col("v") === "v5").count() == 1L)
  }

  test("snapshot DSv2 write: Spark plans the clustering, stats ride the writers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tmpDir("snapdsv2w") + "/s"
    graft.core.Snapshot.write(
      (0L until 100L).map(i => (i, i * 3, s"u$i", s"v$i"))
        .toDF("k", "w", "uid", "v"),
      path, "k", nFiles = 4, statCols2 = Seq("w"), bloomCol = Some("uid"))
    // APPEND through plain df.write: the connector declares the range
    // distribution + ordering, Spark plans the exchange, each writer
    // emits one file whose zone-map row and bloom bits were computed
    // inline — no post-write stats job
    (100L until 300L).map(i => (i, i * 3, s"u$i", s"v$i"))
      .toDF("k", "w", "uid", "v")
      .write.format("graft-snapshot").mode("append")
      .option("nfiles", 4).save(path)
    assert(graft.core.Snapshot.current(spark, path) == 2)
    val m = graft.core.Snapshot.manifest(spark, path)
    assert(m.map(_.rows).sum == 300L)
    // the appended files carry real bands and secondary stats
    val appended = m.filter(_.min >= 100L)
    assert(appended.nonEmpty && appended.forall(_.extra.head.isDefined))
    // correctness through every probe tier: key range, secondary range,
    // bloom lookup of an APPENDED row
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 300L)
    assert(graft.core.Snapshot.scanBy(spark, path, "w", 600L, 627L)
      .orderBy("k").as[(Long, Long, String, String)].collect().toSeq ==
      (200L to 209L).map(i => (i, i * 3, s"u$i", s"v$i")))
    assert(graft.core.Snapshot.lookupEq(spark, path, "u250")
      .as[(Long, Long, String, String)].collect().toSeq ==
      Seq((250L, 750L, "u250", "v250")))
    // the appended band prunes: a probe inside it reads few files
    assert(graft.core.Snapshot.selectFiles(spark, path, 150L, 160L)
      .size <= 2)
    // OVERWRITE replaces transactionally as a fresh INCARNATION at
    // v(N+1) — old versions stay time-travel-readable until vacuum —
    // with the registrations carried over
    (0L until 50L).map(i => (i, i * 7, s"x$i", s"y$i"))
      .toDF("k", "w", "uid", "v")
      .write.format("graft-snapshot").mode("overwrite")
      .option("nfiles", 2).save(path)
    assert(graft.core.Snapshot.current(spark, path) == 3)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 50L)
    // the replaced incarnation is still there below the replace
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L,
      version = Some(2)).count() == 300L)
    assert(graft.core.Snapshot.lookupEq(spark, path, "x7")
      .as[(Long, Long, String, String)].collect().toSeq ==
      Seq((7L, 49L, "x7", "y7")))
    // and the table keeps appending after the replace
    Seq((500L, 1L, "x500", "y500")).toDF("k", "w", "uid", "v")
      .write.format("graft-snapshot").mode("append").save(path)
    assert(graft.core.Snapshot.scan(spark, path, "k", 500L, 500L)
      .count() == 1L)
    // schema drift fails loudly at plan time
    intercept[Exception] {
      Seq((1L, "oops")).toDF("k", "v")
        .write.format("graft-snapshot").mode("append").save(path)
    }
    // a NULL statCol row fails the job; nothing commits
    val before = graft.core.Snapshot.current(spark, path)
    intercept[Exception] {
      Seq((None: Option[Long], 1L, "u", "v")).toDF("k", "w", "uid", "v")
        .write.format("graft-snapshot").mode("append").save(path)
    }
    assert(graft.core.Snapshot.current(spark, path) == before)
  }

  test("snapshot DSv2 streaming source: micro-batches follow the version log") {
    import spark.implicits._
    val path = tmpDir("snapdsv2s") + "/s"
    val outDir = tmpDir("snapdsv2sout")
    val ckpt = tmpDir("snapdsv2sckpt")
    graft.core.Snapshot.write(
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 2)
    def readOut() = spark.read.schema("k LONG, v STRING").parquet(outDir)
    val q = spark.readStream.format("graft-snapshot").load(path)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // bootstrap batch: everything through the current version
      q.processAllAvailable()
      assert(readOut().count() == 10L)
      // a new commit becomes the next micro-batch - only its increment
      graft.core.Snapshot.append(
        (10L until 17L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
        nFiles = 1)
      q.processAllAvailable()
      assert(readOut().orderBy("k").as[(Long, String)]
        .collect().toSeq == (0L until 17L).map(i => (i, s"v$i")))
      // two commits between triggers fold into one window, no dupes
      graft.core.Snapshot.append(
        Seq((17L, "v17")).toDF("k", "v"), path, "k", nFiles = 1)
      graft.core.Snapshot.append(
        Seq((18L, "v18")).toDF("k", "v"), path, "k", nFiles = 1)
      q.processAllAvailable()
      assert(readOut().count() == 19L)
      assert(readOut().select("k").distinct().count() == 19L)
    } finally q.stop()
    // restart from the SAME checkpoint: offsets resume at the last
    // committed version - nothing replays, only new commits flow
    graft.core.Snapshot.append(
      Seq((19L, "v19")).toDF("k", "v"), path, "k", nFiles = 1)
    val q2 = spark.readStream.format("graft-snapshot").load(path)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q2.processAllAvailable()
      assert(readOut().orderBy("k").as[(Long, String)].collect().toSeq ==
        (0L until 20L).map(i => (i, s"v$i")))
    } finally q2.stop()
    // an OVERWRITE under the checkpoint is DETECTED (offsets carry the
    // table's incarnation id), never silently misread against the new
    // table's version numbers
    graft.core.Snapshot.write(Seq((99L, "x")).toDF("k", "v"), path, "k",
      nFiles = 1)
    val q3 = spark.readStream.format("graft-snapshot").load(path)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable()
      finally q3.stop()
      q3.awaitTermination()
    }
    assert(err.getMessage.contains("REPLACED") ||
      Option(err.getCause).exists(_.getMessage.contains("REPLACED")),
      err.getMessage)
  }

  test("snapshot zone-map: empty relation round-trips with its schema") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("k", "v")
    val path = tmpDir("snapempty") + "/s"
    graft.core.Snapshot.write(df, path, "k", nFiles = 4)
    val out = graft.core.Snapshot.scan(spark, path, "k", 0L, 10L)
    assert(out.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }

  test("flatten handles struct-in-array-in-struct nesting") {
    import org.apache.spark.sql.types._
    val inner = StructType(Seq(StructField("c", LongType)))
    val elem = StructType(Seq(StructField("b", inner)))
    val a = StructType(Seq(StructField("xs", ArrayType(elem))))
    val schema = StructType(Seq(StructField("a", a)))
    assert(Flatten.columnPaths(schema) == Seq("a__xs__b__c"))
    val df = spark.read.json(Seq("""{"a":{"xs":[{"b":{"c":7}},{"b":{"c":8}}]}}""").toDS)
    val flat = df.select(
      Flatten.extract(df("a"), schema.fields.head.dataType, List("xs", "b", "c")).as("v"))
    assert(flat.as[Seq[Long]].collect().head == Seq(7L, 8L))
  }

  test("snapshot SQL catalog: CREATE/INSERT/SELECT/time travel/DELETE/UPDATE/MERGE INTO resolve onto the table format") {
    import spark.implicits._
    val wh = tmpDir("snapcat")
    spark.conf.set("spark.sql.catalog.gtest",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    // CREATE TABLE registers the zone-map cluster key from properties
    spark.sql("CREATE TABLE gtest.db.t (k BIGINT, ln BIGINT, v STRING) " +
      "TBLPROPERTIES ('statcol' = 'k')")
    assert(spark.sql("SHOW TABLES IN gtest.db").count() == 1L)
    // INSERT INTO rides the DSv2 write (range clustering + inline stats)
    (0L until 100L).flatMap(k => Seq((k, 1L, s"a$k"), (k, 2L, s"b$k")))
      .toDF("k", "ln", "v").createOrReplaceTempView("src_rows")
    spark.sql("INSERT INTO gtest.db.t SELECT * FROM src_rows")
    assert(spark.sql("SELECT count(*) FROM gtest.db.t").as[Long].head()
      == 200L)
    // SELECT with a cluster-key WHERE prunes through the same manifest
    val probe = spark.sql(
      "SELECT k, ln, v FROM gtest.db.t WHERE k BETWEEN 10 AND 14")
    assert(probe.count() == 10L)
    val tablePath = s"$wh/db/t"
    // DELETE FROM with a cluster-key range takes the METADATA path
    // (Snapshot.delete — only overlapping files rewrite)
    spark.sql("DELETE FROM gtest.db.t WHERE k BETWEEN 90 AND 99")
    assert(spark.sql("SELECT count(*) FROM gtest.db.t").as[Long].head()
      == 180L)
    // time travel: the pre-delete version still reads through SQL
    assert(spark.sql("SELECT count(*) FROM gtest.db.t VERSION AS OF 2")
      .as[Long].head() == 200L)
    // UPDATE (a non-key predicate): the group-based row-level rewrite
    spark.sql("UPDATE gtest.db.t SET v = 'upd' WHERE ln = 2 AND k < 3")
    assert(spark.sql(
      "SELECT count(*) FROM gtest.db.t WHERE v = 'upd'").as[Long].head()
      == 3L)
    assert(spark.sql("SELECT count(*) FROM gtest.db.t").as[Long].head()
      == 180L)
    // MERGE INTO: key-replace + insert through pure SQL
    Seq((5L, 1L, "A5"), (5L, 2L, "B5"), (500L, 1L, "new"))
      .toDF("k", "ln", "v").createOrReplaceTempView("merge_src")
    spark.sql("MERGE INTO gtest.db.t t USING merge_src s ON t.k = s.k " +
      "AND t.ln = s.ln " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val merged = spark.sql(
      "SELECT v FROM gtest.db.t WHERE k = 5 ORDER BY ln")
      .as[String].collect().toSeq
    assert(merged == Seq("A5", "B5"))
    assert(spark.sql("SELECT v FROM gtest.db.t WHERE k = 500")
      .as[String].head() == "new")
    assert(spark.sql("SELECT count(*) FROM gtest.db.t").as[Long].head()
      == 181L)
    // a general DELETE (non-key predicate) also rides the rewrite
    spark.sql("DELETE FROM gtest.db.t WHERE v = 'upd'")
    assert(spark.sql("SELECT count(*) FROM gtest.db.t").as[Long].head()
      == 178L)
    // the SQL surface and the library API drive ONE table
    assert(graft.core.Snapshot.scan(spark, tablePath, "k", 0L, 999L)
      .count() == 178L)
    // DROP TABLE removes it
    spark.sql("DROP TABLE gtest.db.t")
    assert(spark.sql("SHOW TABLES IN gtest.db").count() == 0L)
  }

  test("snapshot restore: metadata-only rollback, sidecars restored verbatim, history stays linear") {
    import spark.implicits._
    val path = tmpDir("snaprestore") + "/s"
    graft.core.Snapshot.write(
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 4)
    graft.core.Snapshot.append(
      (100L until 120L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    graft.core.Snapshot.delete(spark, path, "k", 0L, 49L) // v3
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 70L)
    // restore to the pre-delete version: pure metadata, nothing rewrites
    val filesBefore = graft.core.Snapshot.manifest(spark, path, Some(2))
    graft.core.Snapshot.restore(spark, path, 2)
    assert(graft.core.Snapshot.current(spark, path) == 4)
    assert(graft.core.Snapshot.manifest(spark, path) == filesBefore)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 120L)
    // the rolled-back version still reads below (linear history)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L,
      version = Some(3)).count() == 70L)
    // a restore across a DV delete restores the UNMASKED state
    graft.core.Snapshot.deleteVectors(spark, path, "k", 10L, 19L) // v5
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 110L)
    graft.core.Snapshot.restore(spark, path, 4) // v6: mask gone
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 120L)
    // ...and restoring INTO the masked version brings the mask back
    graft.core.Snapshot.restore(spark, path, 5)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 110L)
    // guards: below the incarnation start, and below a schema evolution
    graft.core.Snapshot.write(Seq((1L, "x")).toDF("k", "v"), path, "k",
      nFiles = 1) // replace: v8 starts a new incarnation
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.restore(spark, path, 4)
    }
    graft.core.Snapshot.append(
      Seq((2L, "y", 9L)).toDF("k", "v", "extra"), path, "k", nFiles = 1)
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.restore(spark, path, 8)
    }
  }

  test("snapshot native streaming sink: writeStream commits versions exactly-once") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("snapsink") + "/s"
    graft.core.Snapshot.write(Seq.empty[(Long, String)].toDF("k", "v"),
      path, "k", nFiles = 1)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream
      .format("graft-snapshot")
      .option("checkpointLocation", tmpDir("snapsinkckpt"))
      .start(path)
    try {
      input.addData((0L until 50L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      input.addData((50L until 80L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == (0L until 80L).map(i => (i, s"v$i")))
    // each micro-batch landed as its own version with real bands
    assert(graft.core.Snapshot.current(spark, path) >= 3)
    assert(graft.core.Snapshot.selectFiles(spark, path, 60L, 79L)
      .nonEmpty)
    // epoch replay through the txn map is a no-op (the crash-redelivery
    // contract): re-commit an already-committed epoch id directly
    val before = graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count()
    graft.core.Snapshot.commitExternalBatch(spark, path,
      Seq(graft.core.Snapshot.FileStat("file:/nonexistent.parquet",
        0L, 0L, 999L)), Nil, batchId = 0L,
      writerId = {
        // the stream's writer id is its query id — read it off the head
        // marker's txn map
        val h = graft.core.Snapshot.current(spark, path)
        // any existing writer id works for the replay check (read the
        // marker directly — Spark's file source skips _-prefixed files)
        java.nio.file.Files.readAllLines(
            java.nio.file.Paths.get(path, s"_commit.v$h"))
          .asScala.find(_.startsWith("txn=")).get.stripPrefix("txn=")
          .split(";").head.split(":").head
      })
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == before)
  }

  test("snapshot DSv2 incremental read and manifest-exact statistics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tmpDir("snapdsv2incr") + "/s"
    graft.core.Snapshot.write(
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 4)
    graft.core.Snapshot.append(
      (100L until 130L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    // startingVersion: only the window's ADDED files participate
    val incr = spark.read.format("graft-snapshot")
      .option("startingVersion", 1).load(path)
    assert(incr.orderBy("k").as[(Long, String)].collect().toSeq ==
      (100L until 130L).map(i => (i, s"v$i")))
    // ...and it composes with pruning/residual filters
    assert(spark.read.format("graft-snapshot")
      .option("startingVersion", 1).load(path)
      .where(col("k") >= 110 && col("k") <= 114).count() == 5L)
    // manifest-exact statistics flow into Catalyst: the PRUNED probe
    // reports the pruned rows, not the table's
    val probe = spark.read.format("graft-snapshot").load(path)
      .where(col("k") >= 100 && col("k") <= 999)
    val stats = probe.queryExecution.optimizedPlan.collectLeaves().head.stats
    assert(stats.rowCount.exists(_.toLong == 30L),
      s"expected pruned rowCount 30, got ${stats.rowCount}")
    // the unpruned read reports the whole table
    val all = spark.read.format("graft-snapshot").load(path)
    assert(all.queryExecution.optimizedPlan.collectLeaves().head
      .stats.rowCount.exists(_.toLong == 130L))
  }

  test("snapshot DSv2 aggregate pushdown: COUNT/MIN/MAX answered from the manifest, zero data reads") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val path = tmpDir("snapdsv2agg") + "/s"
    graft.core.Snapshot.write(
      (5L until 1005L).map(i => (i, i * 3, s"v$i")).toDF("k", "w", "v"),
      path, "k", nFiles = 8, statCols2 = Seq("w"))
    val t = spark.read.format("graft-snapshot").load(path)
    val agg = t.agg(count(lit(1)).as("cnt"), min(col("k")).as("mn"),
      max(col("k")).as("mx"), min(col("w")).as("wmn"),
      max(col("w")).as("wmx"))
    assert(agg.as[(Long, Long, Long, Long, Long)].head() ==
      ((1000L, 5L, 1004L, 15L, 3012L)))
    // the answer came from the manifest: no parquet scan anywhere
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("manifest aggregate"), plan)
    assert(!plan.contains("Parquet"), plan)
    // a FILTERED aggregate is NOT pushed (bands cannot answer it
    // exactly) and still computes correctly through the normal scan
    assert(t.where(col("k") >= 100 && col("k") <= 199)
      .agg(count(lit(1))).as[Long].head() == 100L)
    // an aggregate the manifest cannot answer (SUM) is refused too
    assert(t.agg(org.apache.spark.sql.functions.sum(col("k")))
      .as[Long].head() == (5L until 1005L).sum)
    // deletion vectors flip the table to NOT pushable: the masked count
    // must go through... and the DV read gate throws for this tier, so
    // the metadata path must NOT answer stale totals silently
    graft.core.Snapshot.deleteVectors(spark, path, "k", 5L, 14L)
    intercept[Exception] {
      spark.read.format("graft-snapshot").load(path)
        .agg(count(lit(1))).as[Long].head()
    }
    assert(graft.core.Snapshot.countRange(spark, path, "k", 0L, 9999L)
      .as[Long].head() == 990L)
    // an EMPTY table answers count 0 and NULL min/max from metadata
    val empty = tmpDir("snapdsv2agg0") + "/s"
    graft.core.Snapshot.write(Seq.empty[(Long, String)].toDF("k", "v"),
      empty, "k", nFiles = 1)
    val e = spark.read.format("graft-snapshot").load(empty)
      .agg(count(lit(1)), min(col("k")), max(col("k")))
      .as[(Long, Option[Long], Option[Long])].head()
    assert(e == ((0L, None, None)))
  }

  test("snapshot SQL DDL: CTAS, ALTER TABLE ADD COLUMN, TIMESTAMP AS OF, table properties") {
    import spark.implicits._
    val wh = tmpDir("snapddl")
    spark.conf.set("spark.sql.catalog.gddl",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gddl.warehouse", wh)
    // CTAS: schema from the query, registration from properties
    (0L until 40L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE gddl.c TBLPROPERTIES ('statcol' = 'k') " +
      "AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT count(*) FROM gddl.c").as[Long].head() == 40L)
    assert(spark.sql("SELECT v FROM gddl.c WHERE k = 7").as[String]
      .head() == "v7")
    // registration surfaces as table properties
    val props = spark.sql("SHOW TBLPROPERTIES gddl.c")
      .as[(String, String)].collect().toMap
    assert(props.get("statcol").contains("k"))
    // TIMESTAMP AS OF: a mid-point timestamp resolves to the version
    // committed before it
    Thread.sleep(30)
    val mid = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(30)
    spark.sql("INSERT INTO gddl.c SELECT k + 100, v FROM ctas_src")
    assert(spark.sql("SELECT count(*) FROM gddl.c").as[Long].head() == 80L)
    assert(spark.sql(
      s"SELECT count(*) FROM gddl.c TIMESTAMP AS OF '$mid'")
      .as[Long].head() == 40L)
    // ALTER TABLE ADD COLUMN: pure metadata; old rows null-fill
    spark.sql("ALTER TABLE gddl.c ADD COLUMN score BIGINT")
    assert(spark.sql("SELECT count(*) FROM gddl.c WHERE score IS NULL")
      .as[Long].head() == 80L)
    spark.sql("INSERT INTO gddl.c VALUES (500, 'x', 9)")
    assert(spark.sql("SELECT score FROM gddl.c WHERE k = 500")
      .as[Long].head() == 9L)
    // the evolution is append-only: dropping a column is refused
    intercept[Exception] {
      spark.sql("ALTER TABLE gddl.c DROP COLUMN v")
    }
    // time travel below the evolution still reads the OLD shape
    assert(!spark.sql("SELECT * FROM gddl.c VERSION AS OF 2")
      .columns.contains("score"))
  }

  test("snapshot replace is additive: old incarnation time-travels until vacuum reclaims it") {
    import spark.implicits._
    val path = tmpDir("snapreplace") + "/s"
    graft.core.Snapshot.write(
      (0L until 100L).map(i => (i, s"old$i")).toDF("k", "v"), path, "k",
      nFiles = 4)
    graft.core.Snapshot.append(
      (100L until 120L).map(i => (i, s"old$i")).toDF("k", "v"), path, "k",
      nFiles = 1)
    // REPLACE: lands as v3 (a fresh incarnation), not a reset-to-v1 —
    // and with a DIFFERENT registration (secondary stat column added)
    graft.core.Snapshot.write(
      (0L until 10L).map(i => (i, i * 2, s"new$i")).toDF("k", "w", "v"),
      path, "k", nFiles = 2, statCols2 = Seq("w"))
    assert(graft.core.Snapshot.current(spark, path) == 3)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 10L)
    // the NEW registration answers probes; the OLD incarnation's
    // manifests still read below the replace (time travel)
    assert(graft.core.Snapshot.scanBy(spark, path, "w", 4L, 8L)
      .count() == 3L)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L,
      version = Some(2)).count() == 120L)
    // version 2 reads under the OLD schema (no w column)
    assert(graft.core.Snapshot.schemaAt(spark, path, 2)
      .fieldNames.toSeq == Seq("k", "v"))
    // a crash "before the marker" (here: a failing replace) leaves the
    // current incarnation fully intact — nothing was deleted up front
    intercept[IllegalArgumentException] {
      graft.core.Snapshot.write(
        Seq((Some(1L), "a"), (None: Option[Long], "b")).toDF("k", "v"),
        path, "k", nFiles = 1)
    }
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 10L)
    // vacuum reclaims the replaced incarnation's files once its
    // versions fall out of retention
    val (expired, dropped) =
      graft.core.Snapshot.vacuum(spark, path, keepVersions = 1)
    assert(expired == 2 && dropped > 0)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 10L)
    intercept[Exception] {
      graft.core.Snapshot.manifest(spark, path, Some(2))
    }
    // the table keeps working: append onto the new incarnation
    graft.core.Snapshot.append(
      Seq((50L, 100L, "new50")).toDF("k", "w", "v"), path, "k", nFiles = 1)
    assert(graft.core.Snapshot.current(spark, path) == 4)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 999L)
      .count() == 11L)
  }

  test("commit store seam: conditional-CAS arbiter decides races; a non-atomic store loses loudly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // 1) the InMemoryCas arbiter (the external-CAS object-store posture):
    //    registered for the table, racing appends still serialize onto
    //    dense versions with both deltas present
    val path = tmpDir("snapcas") + "/s"
    graft.core.Snapshot.setCommitStore(path,
      new graft.core.CommitStore.InMemoryCas)
    try {
      graft.core.Snapshot.write(
        (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
        nFiles = 1)
      val t1 = new Thread(() => graft.core.Snapshot.append(
        (10L until 20L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
        nFiles = 1))
      val t2 = new Thread(() => graft.core.Snapshot.append(
        (20L until 30L).map(i => (i, s"v$i")).toDF("k", "v"), path, "k",
        nFiles = 1))
      t1.start(); t2.start(); t1.join(); t2.join()
      val hist = graft.core.Snapshot.history(spark, path)
      assert(hist.map(_._1) == Seq(1, 2, 3) && hist.last._3 == 30L)
    } finally graft.core.Snapshot.clearCommitStore(path)

    // 2) the raw arbiter race, driven straight at the seam (the commit
    //    loop's same-JVM lock would otherwise serialize threads before
    //    the store): exactly one of two simultaneous claims wins
    val path2 = tmpDir("snapcas2") + "/s"
    new java.io.File(path2).mkdirs()
    graft.core.Snapshot.setCommitStore(path2,
      new graft.core.CommitStore.InMemoryCas)
    try {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val ts = Seq("A", "B").map(who => new Thread(() => {
        gate.await()
        results.add(graft.core.Snapshot.tryCommitMarker(
          spark, path2, 1, s"manifest=_staged/m.v1.$who.tsv\nincv=1\n"))
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(results.size == 2 && results.asScala.count(identity) == 1)
    } finally graft.core.Snapshot.clearCommitStore(path2)

    // 3) a deliberately NON-ATOMIC store (exists-then-create, the S3A
    //    shape): both racers' creates go through, but the read-back
    //    tripwire makes the stomped writer LOSE LOUDLY (false -> rebase/
    //    abort upstream) instead of silently dropping a commit
    val path3 = tmpDir("snapcas3") + "/s"
    new java.io.File(path3).mkdirs()
    val both = new java.util.concurrent.CyclicBarrier(2)
    val writeLock = new Object
    val nonAtomic = new graft.core.CommitStore {
      override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                               p: org.apache.hadoop.fs.Path,
                               payload: Array[Byte]): Boolean = {
        if (fs.exists(p)) return false
        both.await() // both racers pass the exists check...
        writeLock.synchronized { // (writes serialized: local FS would
          val out = fs.create(p, true) // corrupt its .crc sidecar on a
          try out.write(payload) finally out.close() // byte-interleaved
        } // stomp; a real object store just takes last-write-wins)
        both.await() // neither verifies until both writes landed
        true
      }
    }
    graft.core.Snapshot.setCommitStore(path3, nonAtomic)
    try {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      val ts = Seq("A", "B").map(who => new Thread(() => {
        results.add(graft.core.Snapshot.tryCommitMarker(
          spark, path3, 1, s"manifest=_staged/m.v1.$who.tsv\nincv=1\n"))
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      // last write won the content; the OTHER claim must come back false
      assert(results.size == 2 && results.asScala.count(identity) == 1)
    } finally graft.core.Snapshot.clearCommitStore(path3)
  }

  test("deletion vectors: point delete is metadata-only, reads mask, compact purges") {
    import spark.implicits._
    val path = tmpDir("snapdv") + "/s"
    val df = (0L until 1000L).map(i => (i, s"u$i", s"v$i"))
      .toDF("k", "uid", "v")
    graft.core.Snapshot.write(df, path, "k", nFiles = 10,
      bloomCol = Some("uid"))
    val before = graft.core.Snapshot.manifest(spark, path)
    graft.core.Snapshot.deleteVectors(spark, path, "k", 300L, 309L)
    val after = graft.core.Snapshot.manifest(spark, path)
    // ZERO data files rewritten: the manifest rows are identical
    assert(after == before)
    // every library read masks: range scan, point lookup, count
    val got = graft.core.Snapshot.scan(spark, path, "k", 290L, 319L)
      .orderBy("k").select("k").as[Long].collect().toSeq
    assert(got == ((290L to 299L) ++ (310L to 319L)))
    assert(graft.core.Snapshot.lookupEq(spark, path, "u305").count() == 0L)
    assert(graft.core.Snapshot.lookupEq(spark, path, "u299")
      .count() == 1L)
    // metadata count: full-inside files subtract their mask, straddling
    // files scan through it
    assert(graft.core.Snapshot.countRange(spark, path, "k", 0L, 9999L)
      .as[Long].head() == 990L)
    assert(graft.core.Snapshot.countRange(spark, path, "k", 250L, 349L)
      .as[Long].head() == 90L)
    // history reports LIVE rows
    assert(graft.core.Snapshot.history(spark, path).last._3 == 990L)
    // time travel below the DV commit still sees the rows
    assert(graft.core.Snapshot.scan(spark, path, "k", 300L, 309L,
      version = Some(1)).count() == 10L)
    // a second DV delete unions per-file masks
    graft.core.Snapshot.deleteVectors(spark, path, "k", 305L, 314L)
    assert(graft.core.Snapshot.scan(spark, path, "k", 290L, 329L)
      .count() == 25L)
    // the DSv2 reader refuses the masked table loudly (reader-version
    // gate) rather than leaking deleted rows
    val err = intercept[Exception] {
      spark.read.format("graft-snapshot").load(path).count()
    }
    assert(err.getMessage.contains("deletion vectors"))
    // copy-on-write ops read THROUGH the mask; compact purges it
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 4)
    assert(graft.core.Snapshot.scan(spark, path, "k", 0L, 9999L)
      .count() == 985L)
    assert(spark.read.format("graft-snapshot").load(path).count() == 985L)
    // ...and the bloom sidecar rebuilt without the masked rows' files
    assert(graft.core.Snapshot.lookupEq(spark, path, "u307").count() == 0L)
    assert(graft.core.Snapshot.lookupEq(spark, path, "u999").count() == 1L)
  }

  test("typed CDF: insert/delete/update pairs across append, delete, DV and merge commits; compact emits nothing") {
    import spark.implicits._
    val path = tmpDir("snapcdf") + "/s"
    // v1: keys 0..99, two rows per key
    graft.core.Snapshot.write(
      (0L until 100L).flatMap(k => Seq((k, 1L, s"a$k"), (k, 2L, s"b$k")))
        .toDF("k", "ln", "v"), path, "k", nFiles = 10)
    // v2: append keys 100..109
    graft.core.Snapshot.append(
      (100L until 110L).map(k => (k, 1L, s"a$k")).toDF("k", "ln", "v"),
      path, "k", nFiles = 1)
    // v3: copy-on-write delete of keys 10..14
    graft.core.Snapshot.delete(spark, path, "k", 10L, 14L)
    // v4: merge — replace keys 20..24 (new values), insert key 500
    graft.core.Snapshot.merge(
      ((20L until 25L).flatMap(k => Seq((k, 1L, s"A$k"), (k, 2L, s"B$k")))
        :+ ((500L, 1L, "new"))).toDF("k", "ln", "v"), path, "k", nFiles = 1)
    // v5: DV delete of key 30
    graft.core.Snapshot.deleteVectors(spark, path, "k", 30L, 30L)
    // v6: compact — a pure rewrite must emit NOTHING
    graft.core.Snapshot.compact(spark, path, "k", nFiles = 4)
    val cdf = graft.core.Snapshot.changesTyped(spark, path, 1, 6)
      .orderBy("_commit_version", "_change_type", "k", "ln")
      .as[(Long, Long, String, String, Int)].collect().toSeq
    val expected = (
      (100L until 110L).map(k => (k, 1L, s"a$k", "insert", 2)) ++
      (10L until 15L).flatMap(k =>
        Seq((k, 1L, s"a$k", "delete", 3), (k, 2L, s"b$k", "delete", 3))) ++
      Seq((500L, 1L, "new", "insert", 4)) ++
      (20L until 25L).flatMap(k => Seq(
        (k, 1L, s"a$k", "update_preimage", 4),
        (k, 2L, s"b$k", "update_preimage", 4))) ++
      (20L until 25L).flatMap(k => Seq(
        (k, 1L, s"A$k", "update_postimage", 4),
        (k, 2L, s"B$k", "update_postimage", 4))) ++
      Seq((30L, 1L, "a30", "delete", 5), (30L, 2L, "b30", "delete", 5))
    ).sortBy(r => (r._5, r._4, r._1, r._2))
    assert(cdf == expected)
    // a window over only the compact step is empty
    assert(graft.core.Snapshot.changesTyped(spark, path, 5, 6).count() == 0L)
    // schema evolution inside the window null-fills earlier steps
    graft.core.Snapshot.append(
      Seq((600L, 1L, "x", 9L)).toDF("k", "ln", "v", "extra"), path, "k",
      nFiles = 1)
    val evolved = graft.core.Snapshot.changesTyped(spark, path, 3, 7)
    assert(evolved.schema.fieldNames.toSeq ==
      Seq("k", "ln", "v", "extra", "_change_type", "_commit_version"))
    assert(evolved.where($"_commit_version" === 7).count() == 1L)
    // a window crossing a REPLACE is refused loudly: the two sides are
    // different incarnations (the old files may not even read under the
    // new schema) — consumers restart the feed, like the streaming source
    graft.core.Snapshot.write(
      Seq((1L, "z")).toDF("k", "note"), path, "k", nFiles = 1) // v8
    val err = intercept[IllegalArgumentException] {
      graft.core.Snapshot.changesTyped(spark, path, 5, 8)
    }
    assert(err.getMessage.contains("REPLACE"))
    // a window fully inside the new incarnation still works
    graft.core.Snapshot.append(Seq((2L, "y")).toDF("k", "note"), path,
      "k", nFiles = 1)
    assert(graft.core.Snapshot.changesTyped(spark, path, 8, 9)
      .count() == 1L)
  }
}
