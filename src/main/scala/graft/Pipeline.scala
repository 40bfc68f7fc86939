package graft

import graft.core.{Tables, Validation}
import graft.llm.{Dedup, Similarity, TextStats}
import graft.profile.Profile
import graft.stream.{DqAlerts, DqCounters}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end pipeline demo: one `runMain graft.Pipeline [sfDir] [outDir]`
  * exercises the full engine story the way a user of the reference would —
  * ingest+validate → silver parquet → profile → generated bounds →
  * violation counters + alert windows → corpus dedup → similarity — and
  * prints a one-line summary per stage.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dq = new DqCounters.Listener("dq")
    spark.listenerManager.register(dq)

    // 1. ingest: events.props is the raw JSON log; validate + split
    val ev = Tables(spark, sfDir, "events")
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
    val rules = Seq("event_id", "user_id", "k").map(f =>
      Validation.Rule(f, "missing", col(f).isNull))
    // observe-metrics fire once per action (like Prometheus counters); the
    // silver write is the single counted pass
    val (valid, _) = Validation.split(DqCounters.observed(ev, rules), rules)
    valid.drop("_violations").write.mode("overwrite").parquet(s"$outDir/events_silver")
    val (_, invalid) = Validation.split(ev, rules)
    println(s"[pipeline] ingest: ${spark.read.parquet(s"$outDir/events_silver").count()} valid, " +
      s"${invalid.count()} quarantined")

    // 2. profile the silver table → generated bounds → next-batch validation
    val silver = spark.read.parquet(s"$outDir/events_silver")
    val prof = Profile.summarize(silver, Seq("value", "k"), exact = true)
    val (bounds, required) = Profile.toBounds(prof)
    println(s"[pipeline] profile: bounds=${bounds.keys.toSeq.sorted.mkString(",")} required=${required.sorted.mkString(",")}")
    val nextRules = Validation.boundsRules(bounds)
    val alerts = DqAlerts.alertCounts(
      Validation.violations(silver.withColumn("value", col("value") * 2), nextRules)
        .crossJoin(silver.select(col("ts")).limit(1))) // synthetic ts for demo
    println(s"[pipeline] dq: ${alerts.count()} alert windows from drifted batch")
    // distributional drift between the profiled baseline and the drifted
    // batch: PSI over fixed bins spanning the baseline's profiled range
    val vb = bounds("value")
    val psiRow = graft.profile.Psi.psi(silver,
        silver.withColumn("value", col("value") * 2), col("value"),
        vb.min.getOrElse(0.0), vb.max.getOrElse(1.0) * 2, 10)
      .collect().head
    println(f"[pipeline] drift: psi=${psiRow.getDouble(0)}%.3f over 10 bins " +
      s"(n_base=${psiRow.getLong(1)}, n_cur=${psiRow.getLong(2)})")
    // the alerting artifact + the persisted schema-version snapshot
    graft.stream.DqRules.save(spark, s"$outDir/data_quality_rules.yml",
      "EventsSilver", bounds.toSeq.sortBy(_._1))
    val (ver, verCols) = graft.etl.Migrate.migrateFromDisk(
      spark, s"$outDir/schema", silver.schema)
    println(s"[pipeline] artifacts: rules yaml + schema snapshot v$ver (${verCols.size} cols)")

    // 3. corpus ops over documents: dedup → cluster resolution →
    //    decontamination → assembly (mix, sample, pack)
    val docs = Tables(spark, sfDir, "documents")
    val nExact = Dedup.exact(docs).where(col("n_dups") > 1).count()
    val pairs = Dedup.ngramJaccard(docs)
    val comps = Dedup.connectedComponents(pairs)
    val nComp = comps.select("component").distinct().count()
    // keep the highest-quality member of each near-dup cluster
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col("quality").desc, col("id").asc)
    val nDropped = comps
      .join(docs.select(col("doc_id").as("id"),
        TextStats.qualityScore(col("text")).as("quality")), "id")
      .withColumn("rn", row_number().over(w)).where(col("rn") > 1).count()
    val nContam = Dedup.decontaminate(
      docs.where(col("doc_id") >= 10), docs.where(col("doc_id") < 10)).count()
    val stats = TextStats.langStats(docs).count()
    println(s"[pipeline] dedup: $nExact exact groups, ${pairs.count()} near-dup pairs " +
      s"in $nComp clusters ($nDropped lower-quality members dropped); " +
      s"$nContam docs eval-contaminated; $stats langs")
    // paragraph-level boilerplate removal + crawl-by-crawl incremental
    // dedup against the persisted signature store (history never rescanned)
    val nParaDocs = Dedup.dedupParagraphs(docs).count()
    val storePath = s"$outDir/sigstore"
    val hist = graft.llm.SignatureStore.build(spark, storePath,
      docs.where(col("doc_id") % 2 === 0))
    val crawl = graft.llm.SignatureStore.ingest(spark, storePath,
      docs.where(col("doc_id") % 2 === 1))
    println(s"[pipeline] incremental: ${hist.where(col("is_dup")).count()} dups " +
      s"inside the history build; ${crawl.where(col("is_dup")).count()} of the " +
      s"new crawl dropped against the store; paragraph dedup keeps $nParaDocs docs")
    // the Gopher drop/keep stage + partial-overlap candidates (winnowing
    // fingerprints catch copied passages whole-doc signatures dilute away)
    val gf = TextStats.gopherFilter(docs)
    val nKept = gf.where(col("kept") === 1).count()
    val nOverlap = Dedup.winnowOverlap(docs).count()
    println(s"[pipeline] filter: $nKept/${docs.count()} docs pass the Gopher rules; " +
      s"$nOverlap partial-overlap candidate pairs by winnowing fingerprint")
    // 3c. the zone-map snapshot table format: history written
    //     range-clustered, a crawl appended as a new version (O(batch)),
    //     a range probe that reads only overlapping files, and the log
    val snapPath = s"$outDir/snapshot"
    val li = Tables(spark, sfDir, "lineitem")
    graft.core.Snapshot.write(li.where(col("l_orderkey") % 2 === 0),
      snapPath, "l_orderkey", nFiles = 8)
    graft.core.Snapshot.append(li.where(col("l_orderkey") % 2 === 1),
      snapPath, "l_orderkey", nFiles = 8)
    val snapFiles = graft.core.Snapshot.selectFiles(spark, snapPath, 100L, 199L)
    val snapTotal = graft.core.Snapshot.manifest(spark, snapPath).size
    val snapRows = graft.core.Snapshot.scan(spark, snapPath,
      "l_orderkey", 100L, 199L).count()
    val snapLog = graft.core.Snapshot.history(spark, snapPath)
    println(s"[pipeline] snapshot: $snapRows rows from " +
      s"${snapFiles.size}/$snapTotal files (zone-map pruned); versions " +
      snapLog.map(h => s"v${h._1}=${h._3}r").mkString(", "))

    val nOutliers = Profile.zscoreOutliers(docs, "n_chars", "lang", 1.5).count()
    val balanced = graft.llm.Corpus.sampleStratified(docs, n = 50)
    val mixed = graft.llm.Corpus.mixWeighted(balanced,
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25))
    val packed = graft.llm.Corpus.packSequences(
      graft.llm.Corpus.sampleHash(mixed, 0.5), budget = 512)
    val binRow = packed.agg(count(lit(1)).as("n"),
      count_distinct(col("lang"), col("bin")).as("bins")).collect().head
    // the final corpus cut: best documents by quality until the token
    // budget is spent (per-score-bucket cumsum — no global window)
    val nBudget = graft.llm.Corpus.selectBudget(docs, budget = 10000L,
      score = TextStats.qualityScore(col("text")),
      tokens = TextStats.tokenCount(col("text")))
      .where(col("keep")).count()
    val nChunks = graft.llm.Corpus.chunkDocuments(docs,
      window = 64, stride = 48).count()
    println(s"[pipeline] assembly: $nOutliers length outliers; " +
      s"${balanced.count()} in balanced sample; " +
      s"${binRow.getLong(0)} docs packed into ${binRow.getLong(1)} context bins; " +
      s"$nBudget docs inside the 10k-token quality budget; " +
      s"$nChunks overlapping context chunks")

    // 3a¼. the ONE-CALL curation facade: the same stages as above in the
    //      canonical order with per-stage yield accounting — what a user
    //      of the library actually calls
    val (curated, curRep) = graft.llm.Curation.run(docs,
      s"$outDir/pairs_idx", evalSet = Some(docs.where(col("doc_id") < 10)),
      tokenBudget = Some(20000L), minWords = 10)
    println(s"[pipeline] curation: $curRep -> ${curated.count()} docs survive")

    // 3a½. split & release: growth-stable train/valid/test labels, the
    //      eval-leakage check over the near-dup pair relation, a KS drift
    //      test between split length distributions, and a DP-noised
    //      release of the corpus composition
    val fr = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)
    val sp = graft.llm.Corpus.splitAssign(docs, fr)
    val nLeak = pairs
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .where(col("split_a") =!= col("split_b")).count()
    val ksRow = graft.profile.Psi.ksStatistic(
      sp.where(col("split") === "train"), sp.where(col("split") =!= "train"),
      col("n_chars")).collect().head
    val dpRel = graft.analytics.Privacy.dpCounts(docs, "source")
    println(f"[pipeline] split: ${sp.where(col("split") === "train").count()} train / " +
      f"${sp.where(col("split") === "valid").count()} valid / " +
      f"${sp.where(col("split") === "test").count()} test; " +
      f"$nLeak near-dup pairs CROSS splits (dedup before splitting!); " +
      f"train-vs-eval KS=${ksRow.getDouble(0)}%.4f; " +
      f"DP release of ${dpRel.count()} source counts")

    // 3b. model-based scoring artifacts trained on the corpus itself:
    //     a BPE merge table, a quality classifier, an n-gram LM — each a
    //     persisted config-sized artifact; scoring is columnar
    val merges = graft.llm.Bpe.train(docs, numMerges = 50)
    graft.llm.Bpe.save(spark, merges, s"$outDir/bpe_merges")
    val lm = graft.llm.NgramLm.train(docs, n = 2)
    graft.llm.NgramLm.save(lm, s"$outDir/lm_model")
    // demo labels: learn to recognize English from hashed BoW — the same
    // mechanics as a real quality/reference classifier, with a label that
    // is actually learnable from this corpus
    val labeled = docs.withColumn("label",
      (col("lang") === "en").cast("double"))
    // the distributed trainer: gradients are keyed integer sums — the
    // driver only ever sees the dim-bounded aggregate, never a document
    val qm = graft.llm.QualityModel.trainDistributed(labeled,
      dim = 1 << 10, epochs = 3)
    graft.llm.QualityModel.save(spark, qm, s"$outDir/quality_model")
    val scoredDocs = graft.llm.NgramLm.score(docs,
        graft.llm.NgramLm.load(spark, s"$outDir/lm_model"), n = 2)
      .join(docs.select(col("doc_id"),
        graft.functions.native.bpeCount(col("text"),
          graft.llm.Bpe.load(spark, s"$outDir/bpe_merges")).as("n_bpe"),
        graft.llm.QualityModel.score(col("text"),
          graft.llm.QualityModel.load(spark, s"$outDir/quality_model"))
          .as("q_model")), "doc_id")
    val sRow = scoredDocs.agg(avg("lm_score"), avg("q_model"),
      sum("n_bpe")).collect().head
    println(f"[pipeline] scoring: ${merges.size} BPE merges " +
      f"(${sRow.getLong(2)} subword tokens corpus-wide), " +
      f"mean lm_score=${sRow.getDouble(0)}%.3f, mean q_model=${sRow.getDouble(1)}%.3f")

    // 3c. model EVAL before trusting the scores downstream: exact
    //     ties-half AUC / accuracy / log-loss of the trained classifier
    //     against its labels, and an A/B readout (Welch t) of the LM score
    //     between the kept and dropped halves of the Gopher filter
    val evalRow = graft.llm.QualityModel.evaluate(
        scoredDocs.join(labeled.select("doc_id", "label"), "doc_id"),
        col("q_model"), col("label")).collect().head
    val keptIds = gf.where(col("kept") === 1).select("doc_id")
    val tRow = graft.analytics.Stats.welchTTest(
        scoredDocs.join(keptIds, "doc_id"),
        scoredDocs.join(gf.where(col("kept") === 0).select("doc_id"), "doc_id"),
        col("lm_score")).collect().head
    println(f"[pipeline] eval: classifier AUC=${evalRow.getDouble(3)}%.3f " +
      f"acc=${evalRow.getDouble(1)}%.3f logloss=${evalRow.getDouble(2)}%.3f; " +
      f"lm_score kept-vs-dropped t=${tRow.getDouble(4)}%.2f " +
      f"(dof=${tRow.getDouble(5)}%.1f)")

    // 4. similarity over embeddings: exact baseline + a persisted IVF index
    //    + the PQ/ADC path whose probe never reads the raw vectors
    val embs = Tables(spark, sfDir, "embeddings")
    val q = embs.orderBy("vec_id").limit(1).select(col("embedding").as("qvec"))
    val top = Similarity.topK(embs, q, 5).collect()
    // the clustered layout: the probe scan partition-prunes to nprobe
    // clusters instead of joining the whole corpus
    val idx = Similarity.buildClusteredIvfIndex(embs, kClusters = 8,
      path = s"$outDir/ivf")
    val ivfTop = Similarity.ivfTopK(idx, embs, q, 5, nprobe = 2,
      "vec_id", "embedding", 6).collect()
    val pq = Similarity.buildPqIndex(embs, m = 8, kCodes = 16)
    val pqTop = Similarity.pqTopK(pq, q, 5).collect()
    // the composed probe: cluster-pruned codes scan + ADC, raw vectors
    // nowhere in the plan
    val ivfpq = Similarity.buildIvfPqIndex(embs, kClusters = 8, m = 8,
      kCodes = 16, path = s"$outDir/ivfpq")
    val ivfPqTop = Similarity.ivfPqTopK(ivfpq, q, 5, nprobe = 2).collect()
    // semantic dedup blocks pairs by the index's learned clusters
    val nSem = Similarity.nearDupPairs(
      embs.join(idx.assignments.withColumnRenamed("id", "vec_id"), "vec_id"),
      partCol = "cluster").count()
    // the k-NN graph over the same learned blocking (SemDeDup's input)
    val nKnn = Similarity.knnGraph(
      embs.join(idx.assignments.withColumnRenamed("id", "vec_id"), "vec_id"),
      k = 3, partCol = "cluster").count()
    idx.unpersist(); pq.unpersist(); ivfpq.unpersist()
    println(s"[pipeline] similarity: exact top-5 ${top.map(_.getLong(0)).mkString(",")}; " +
      s"ivf top-5 ${ivfTop.map(_.getLong(0)).mkString(",")}; " +
      s"pq/adc top-5 ${pqTop.map(_.getLong(0)).mkString(",")}; " +
      s"ivf-pq top-5 ${ivfPqTop.map(_.getLong(0)).mkString(",")}; " +
      s"$nSem semantic near-dup pairs; $nKnn k-NN graph edges")
    // 5. the STREAMING curation stage: the same dedup → gopher story as a
    //    continuous ingest — one readStream→writeStream stage per sink
    //    (curated silver, junk-source heavy hitters), restartable from its
    //    RocksDB checkpoint (recovery is spec-pinned in the test suite)
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val srcDir = s"$outDir/stream_src"
      val streamDocs = docs.limit(300).select(col("doc_id"), col("text"),
        col("source"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
          col("doc_id") % 600).cast("timestamp").as("ts"))
      // two source drops = two micro-batches through the same checkpoint
      streamDocs.where(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(srcDir)
      val schema = streamDocs.schema
      val cur = graft.stream.StreamPipeline.curate(
        spark.readStream.schema(schema).parquet(srcDir), minWords = 10)
      val silverQ = cur.writeStream
        .option("checkpointLocation", s"$outDir/stream_ck_silver")
        .outputMode("append").format("parquet").start(s"$outDir/stream_silver")
      val hitsQ = graft.stream.StreamPipeline.junkSources(cur, threshold = 3L)
        .writeStream.option("checkpointLocation", s"$outDir/stream_ck_hits")
        .outputMode("append").format("parquet").start(s"$outDir/stream_hits")
      try {
        silverQ.processAllAvailable(); hitsQ.processAllAvailable()
        streamDocs.where(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(srcDir)
        silverQ.processAllAvailable(); hitsQ.processAllAvailable()
      } finally { silverQ.stop(); hitsQ.stop() }
      val sil = spark.read.parquet(s"$outDir/stream_silver")
      val nHits = spark.read.parquet(s"$outDir/stream_hits").count()
      println(s"[pipeline] streaming: ${sil.count()} docs curated in 2 micro-batches " +
        s"(${sil.where(col("kept") === 1).count()} kept, " +
        s"${sil.where(col("kept") === 0).count()} dropped; " +
        s"$nHits junk-source heavy-hitter emissions)")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    println(s"[pipeline] counters:\n${dq.renderPrometheus()}")
    spark.stop()
  }
}
