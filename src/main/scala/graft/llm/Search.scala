package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document corpus — the IR pair to
  * [[TextStats]]'s scoring signals: an inverted-index build and BM25
  * top-k, the standard keyword-relevance baseline (Robertson et al.,
  * Okapi BM25; idf in the Lucene always-positive form).
  *
  * Scale shape: the index build is one keyed aggregate over (term,
  * doc) pairs; BM25 filters the corpus to the QUERY'S terms before any
  * shuffle (tokens that don't match never leave the scan), joins the
  * df counts of those few terms as a broadcast, and takes the top-k as
  * a TakeOrderedAndProject — per-partition heaps, no global sort.
  */
object Search {

  /** Inverted index: one row per distinct term — document frequency and
    * the doc_id posting list (ascending). The build is `array_distinct`
    * per doc (row-local) then ONE keyed aggregate, so the only shuffle
    * carries (term, doc_id) pairs. At web scale the posting lists of
    * stop-terms are the classic skew/size hazard — cap them upstream
    * with a df ceiling (join against a stop list or filter on a first
    * aggregate) when the corpus outgrows per-row limits; the synthetic
    * corpus's vocabulary is far below any such bound.
    */
  def invertedIndex(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextStats.tokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))

  /** BM25 top-k for a bag of query terms (k1 = 1.2, b = 0.75, Lucene
    * idf `ln(1 + (N − df + 0.5)/(df + 0.5))`). Per-(doc, term) scores
    * are rounded half-up to integer micro-units BEFORE the per-doc sum,
    * making the ranking bit-reproducible cross-engine (the established
    * micro-unit discipline). Corpus scalars (N, Σdl) ride a one-row
    * broadcast; the term df relation is query-sized and broadcast. The
    * final top-k is `ORDER BY score DESC, doc_id LIMIT k`.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10,
               textCol: String = "text", idCol: String = "doc_id",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val toks = TextStats.tokens(col(textCol))
    // the corpus-scalar pass needs only doc LENGTHS — the arithmetic
    // token count, never the token array (a full tokenize pass saved)
    val stats = docs.select(TextStats.tokenCount(col(textCol)).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // only the query's terms survive the scan — nothing else shuffles —
    // and dl rides the SAME scan (functionally dependent on doc_id), so
    // no corpus-sized doc-length join exists. The query-sized tf relation
    // feeds BOTH the df aggregate and the scoring join: a lazy
    // localCheckpoint materializes the corpus scan once instead of
    // re-running the tokenize+explode subtree per consumer.
    val tf = docs
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    // constants written as the same folded literals the oracle SQL uses
    // ((1.2 + 1.0), (1.0 − 0.75)) so both engines run identical IEEE ops
    val s = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val micro = {
      val x = s * 1e6
      when(x >= 0, floor(x + 0.5)).otherwise(-floor(-x + 0.5)).cast("long")
    }
    scored
      .select(col("doc_id"), micro.as("_m"))
      .groupBy("doc_id").agg(sum(col("_m")).as("_s"))
      .select(col("doc_id"),
        graft.functions.Rounding.dround(
          col("_s").cast("double") / 1e6, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 top-k for a RELATION of queries — the production retrieval
    * shape (a query log scored in one batch), not a literal term list.
    * Same arithmetic as [[bm25TopK]]; additionally:
    *
    *  - the corpus is semi-joined against the DISTINCT term set of all
    *    queries (broadcast — query logs are small next to the corpus),
    *    so only matching tokens ever shuffle;
    *  - per-(doc, term) scores fan out to queries via a broadcast join
    *    on term and sum per (query, doc);
    *  - ranking uses the INTEGER micro-sum (exact; rounding happens only
    *    in the output), with doc_id as the pinned tie-break, through a
    *    per-query window — planned as WindowGroupLimit, per-partition
    *    top-k, no global sort.
    */
  def bm25ForQueries(docs: DataFrame, queries: DataFrame, k: Int = 5,
                     textCol: String = "text", idCol: String = "doc_id",
                     qidCol: String = "query_id", qtextCol: String = "qtext",
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val perQuery = perQueryMicroScores(docs, queries, textCol, idCol,
      qidCol, qtextCol, k1, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(col("_s").desc, col("doc_id"))
    perQuery
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("doc_id"), col("rank"),
        graft.functions.Rounding.dround(
          col("_s").cast("double") / 1e6, 6).as("score"))
  }

  /** Hard-NEGATIVE mining for retrieval/embedding training: per query,
    * the top-`k` BM25-scoring docs that do NOT match every query term —
    * high-scoring partial matches, the negatives contrastive training
    * needs (random negatives are trivially separable; full matches are
    * presumed positives and excluded). Scoring, arithmetic, and
    * tie-breaks are [[bm25ForQueries]]'s (one shared kernel), so the
    * oracle replay differs only in the full-match filter.
    *
    * Returns `(qidCol, doc_id, rank, score, n_match)` — `n_match` the
    * number of distinct query terms the doc contains, strictly less than
    * the query's term count by construction.
    */
  def bm25HardNegatives(docs: DataFrame, queries: DataFrame, k: Int = 5,
                        textCol: String = "text", idCol: String = "doc_id",
                        qidCol: String = "query_id", qtextCol: String = "qtext",
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val nq = queries.select(col(qidCol),
        explode(array_distinct(TextStats.tokens(col(qtextCol)))).as("term"))
      .groupBy(qidCol).agg(count(lit(1)).as("_nq"))
    val perQuery = perQueryMicroScores(docs, queries, textCol, idCol,
      qidCol, qtextCol, k1, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(col("_s").desc, col("doc_id"))
    perQuery
      .join(broadcast(nq), qidCol)
      .where(col("n_match") < col("_nq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("doc_id"), col("rank"),
        graft.functions.Rounding.dround(
          col("_s").cast("double") / 1e6, 6).as("score"),
        col("n_match"))
  }

  /** The scoring kernel shared by [[bm25ForQueries]] and
    * [[bm25HardNegatives]]: per-(query, doc) micro-unit BM25 score `_s`
    * plus `n_match`, the count of distinct query terms present in the
    * doc. Only docs matching ≥1 query term appear.
    */
  private def perQueryMicroScores(docs: DataFrame, queries: DataFrame,
                                  textCol: String, idCol: String,
                                  qidCol: String, qtextCol: String,
                                  k1: Double, b: Double): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    val qt = queries.select(col(qidCol),
      explode(array_distinct(TextStats.tokens(col(qtextCol)))).as("term"))
    val termSet = qt.select("term").distinct()
    // lengths-only pass: arithmetic token count, no array (see bm25TopK)
    val stats = docs.select(TextStats.tokenCount(col(textCol)).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // dl rides the tf scan (no corpus-sized doc-length join), and the
    // query-sized tf relation is lazily checkpointed: it feeds both the
    // df aggregate and the scoring join, which would otherwise each
    // re-run the corpus tokenize+explode subtree.
    val tf = docs
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .join(broadcast(termSet), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val s = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val micro = {
      val x = s * 1e6
      when(x >= 0, floor(x + 0.5)).otherwise(-floor(-x + 0.5)).cast("long")
    }
    scored
      .select(col("doc_id"), col("term"), micro.as("_m"))
      .join(broadcast(qt), "term")
      .groupBy(col(qidCol), col("doc_id"))
      .agg(sum(col("_m")).as("_s"), count(lit(1)).as("n_match"))
  }

  /** Persisted BM25 index: the postings relation laid out on disk
    * partitioned by TERM BUCKET, plus the two corpus scalars scoring
    * needs. The build-once/probe-many artifact — [[bm25ForQueries]]
    * re-tokenizes the corpus per call; against 100 TB every probe must
    * instead read only the probed terms' postings (same posture as the
    * cluster-partitioned IVF layout in [[Similarity]]).
    */
  final case class Bm25Index(postings: DataFrame, nDocs: Long, sumDl: Long,
                             nBuckets: Int, path: String)

  /** Deterministic term→bucket assignment (murmur3 — engine-internal
    * layout only; results never depend on which bucket a term lands in).
    */
  private def termBucket(term: Column, nBuckets: Int): Column =
    pmod(abs(hash(term)), lit(nBuckets))

  /** Build the index at `path`: per-(doc, term) tf with the doc length
    * riding the same scan, written `partitionBy(tb)` so a probe's bucket
    * set becomes a partition FILTER at the scan. One corpus tokenize pass
    * for the postings + one for the corpus scalars; nBuckets bounds the
    * probe read amplification at vocabulary scale (a probe reads
    * |query-term buckets| / nBuckets of the postings bytes).
    */
  def buildBm25Index(docs: DataFrame, path: String, nBuckets: Int = 64,
                     textCol: String = "text", idCol: String = "doc_id"): Bm25Index = {
    val spark = docs.sparkSession
    val toks = TextStats.tokens(col(textCol))
    graft.core.Layouts.writePartitioned(
      docs.select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
          explode(toks).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .withColumn("tb", termBucket(col("term"), nBuckets)),
      path + "/postings", "tb")
    // coalesce: an empty corpus sums to NULL — the stats row must stay
    // well-typed so an empty index loads and probes (to zero hits)
    val st = docs.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .collect().head
    import spark.implicits._
    Seq((st.getLong(0), st.getLong(1), nBuckets))
      .toDF("n_docs", "sum_dl", "n_buckets")
      .write.mode("overwrite").parquet(path + "/stats")
    Bm25Index(graft.core.Layouts.read(spark, path + "/postings"),
      st.getLong(0), st.getLong(1), nBuckets, path)
  }

  /** Base + every appended increment of the postings layout. */
  private def layeredPostings(spark: org.apache.spark.sql.SparkSession,
                              path: String): DataFrame = {
    val incBase = new org.apache.hadoop.fs.Path(path + "/postings_inc")
    val fs = incBase.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incs =
      if (!fs.exists(incBase)) Seq.empty
      else fs.listStatus(incBase).toSeq.filter(_.isDirectory)
        .map(_.getPath.toString).sorted
    incs.map(graft.core.Layouts.read(spark, _))
      .foldLeft(graft.core.Layouts.read(spark, path + "/postings"))(
        _ unionByName _)
  }

  /** Per-increment corpus stats beside the base stats row. */
  private def layeredStats(spark: org.apache.spark.sql.SparkSession,
                           path: String): (Long, Long, Int) = {
    val base = spark.read.parquet(path + "/stats").collect().head
    val incBase = new org.apache.hadoop.fs.Path(path + "/stats_inc")
    val fs = incBase.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (n, dl) =
      if (!fs.exists(incBase)) (0L, 0L)
      else {
        val r = spark.read.option("recursiveFileLookup", "true")
          .parquet(path + "/stats_inc")
          .agg(coalesce(sum("n_docs"), lit(0L)),
            coalesce(sum("sum_dl"), lit(0L))).collect().head
        (r.getLong(0), r.getLong(1))
      }
    (base.getLong(0) + n, base.getLong(1) + dl, base.getInt(2))
  }

  def loadBm25Index(spark: org.apache.spark.sql.SparkSession,
                    path: String): Bm25Index = {
    val (nDocs, sumDl, nBuckets) = layeredStats(spark, path)
    Bm25Index(layeredPostings(spark, path), nDocs, sumDl, nBuckets, path)
  }

  /** Incrementally fold a new crawl into a persisted BM25 index —
    * O(batch), the history never re-tokenized: the batch's (doc, term,
    * tf, dl) postings land in `postings_inc/b<batchId>/` partitioned by
    * the SAME term-bucket function (a term's postings still live entirely
    * in its bucket across base + increments, so df stays exact and probes
    * partition-prune every layer), and the batch's (n_docs, sum_dl) stats
    * land beside them — the corpus scalars are additive. Idempotent per
    * `batchId` (overwrite of that batch's own subdirectories, the
    * [[graft.llm.PairsIndex.append]] recovery contract); batch ids must be
    * fresh, appends sequential. A probe of the appended index is
    * EXACTLY a probe of a from-scratch rebuild — same postings relation,
    * same scalars, same arithmetic (the gate pins it).
    */
  def appendToBm25Index(idx: Bm25Index, batch: DataFrame, batchId: Long,
                        textCol: String = "text",
                        idCol: String = "doc_id"): Bm25Index = {
    val spark = batch.sparkSession
    val toks = TextStats.tokens(col(textCol))
    graft.core.Layouts.writePartitioned(
      batch.select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
          explode(toks).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .withColumn("tb", termBucket(col("term"), idx.nBuckets)),
      idx.path + s"/postings_inc/b$batchId", "tb")
    import spark.implicits._
    val st = batch.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .collect().head
    Seq((st.getLong(0), st.getLong(1)))
      .toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(idx.path + s"/stats_inc/b$batchId")
    loadBm25Index(spark, idx.path)
  }

  /** BM25 for a query relation AGAINST THE INDEX — identical arithmetic
    * (and so identical output) to [[bm25ForQueries]], but the corpus-sized
    * input is the partitioned postings layout: the probed terms' bucket
    * ids (a driver collect bounded by min(|query terms|, nBuckets)) become
    * a literal partition filter, so the scan reads only those buckets'
    * files — never the corpus and never the text. df is recomputed from
    * the probed postings (exact: a term's postings live entirely in its
    * one bucket).
    */
  /** The probe's corpus-sided input: the postings layout restricted to
    * the query terms — the bucket ids become a LITERAL partition filter
    * (collect bounded by min(|query terms|, nBuckets)), then the exact
    * term set joins as a broadcast. Public so plan audits can assert the
    * partition pruning on the scan itself ([[bm25Probe]] checkpoints this
    * relation, which hides the file scan inside the checkpoint job).
    */
  def probedPostings(index: Bm25Index, queries: DataFrame,
                     qidCol: String = "query_id",
                     qtextCol: String = "qtext"): DataFrame = {
    val termSet = queries.select(
        explode(array_distinct(TextStats.tokens(col(qtextCol)))).as("term"))
      .distinct()
    val tbs = termSet
      .select(termBucket(col("term"), index.nBuckets).as("tb"))
      .distinct().collect().map(_.getInt(0)).sorted
    index.postings
      .where(col("tb").isin(tbs.map(Integer.valueOf): _*))
      .join(broadcast(termSet), "term")
  }

  def bm25Probe(index: Bm25Index, queries: DataFrame, k: Int = 5,
                qidCol: String = "query_id", qtextCol: String = "qtext",
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(qidCol),
      explode(array_distinct(TextStats.tokens(col(qtextCol)))).as("term"))
    val posts = probedPostings(index, queries, qidCol, qtextCol)
      .localCheckpoint(false) // feeds df AND scoring — read buckets once
    val df_ = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = lit(index.sumDl).cast("double") / lit(index.nDocs)
    val idf = log(lit(1.0) +
      (lit(index.nDocs) - col("df") + 0.5) / (col("df") + 0.5))
    val s = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val micro = {
      val x = s * 1e6
      when(x >= 0, floor(x + 0.5)).otherwise(-floor(-x + 0.5)).cast("long")
    }
    val perQuery = posts
      .join(broadcast(df_), "term")
      .select(col("doc_id"), col("term"), micro.as("_m"))
      .join(broadcast(qt), "term")
      .groupBy(col(qidCol), col("doc_id")).agg(sum(col("_m")).as("_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(col("_s").desc, col("doc_id"))
    perQuery
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("doc_id"), col("rank"),
        graft.functions.Rounding.dround(
          col("_s").cast("double") / 1e6, 6).as("score"))
  }

  /** HYBRID retrieval — reciprocal-rank fusion (Cormack et al. 2009) of
    * the lexical BM25 leg and the dense cosine leg, the standard fusion a
    * RAG/retrieval pipeline runs when neither sparse nor dense alone is
    * trusted: `rrf(doc) = Σ_legs 1/(kRrf + rank_leg(doc))`, a missing leg
    * contributing 0. Rank-based fusion needs no score normalization
    * across legs (the whole point), and since both legs rank on already
    * cross-engine-exact keys (micro-unit BM25 sums, 6-dp-rounded cosine,
    * id tiebreaks), the fused ordering replays exactly in SQL.
    *
    * Scale posture: the legs do all the data-sized work and are the
    * library's own scale-shaped operators (query terms filtered AT the
    * corpus scan; dense top-k via broadcast query + TakeOrdered) — the
    * fusion itself joins two k-row relations, constant-size at any
    * corpus. `docIds` must align with the embedding ids (the corpus's
    * doc↔vector alignment, audited by `modality_coverage`).
    */
  def hybridTopK(docs: DataFrame, embs: DataFrame, terms: Seq[String],
                 queryVec: DataFrame, k: Int = 10, legK: Int = 10,
                 kRrf: Int = 60,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    val lex = bm25TopK(docs, terms, legK, textCol, idCol)
      .withColumn("lex_rank", row_number().over(w))
      .select(col("doc_id"), col("lex_rank"))
    val wd = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col("vec_id"))
    val dense = Similarity.topK(embs, queryVec, legK)
      .withColumn("dense_rank", row_number().over(wd))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    // both legs are k-row relations: the single-partition windows and the
    // full outer join are constant-size, never corpus-sized
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        graft.functions.Rounding.dround(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("dense_rank")), lit(0.0)),
          6).as("rrf"),
        col("lex_rank"), col("dense_rank"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
