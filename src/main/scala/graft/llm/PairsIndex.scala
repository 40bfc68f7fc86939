package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-duplicate PAIR index — the build-once/read-many artifact
  * for the shingle-Jaccard pair relation and its component resolution.
  *
  * Every curation readout over near-dup structure (droplist, cluster
  * stats, split-leakage audit, cross-source duplication matrix) consumes
  * the same pair relation; recomputing the candidate-generation +
  * verification kernel per readout re-tokenizes the corpus each time —
  * against 100 TB that is the single most expensive kernel in the dedup
  * family, and it is also the most REUSED one. So, like the BM25 postings
  * layout and the cluster-partitioned IVF layout (reference capability:
  * jwills/de4ml keeps no such artifact; this is the scale path the
  * north-star families need), the pairs land on disk once:
  *
  *  - `pairs/` — (doc_a, doc_b, jacc) partitioned by `pb = doc_a %
  *    nBuckets`. The bucket key is plain modulus, NOT an engine hash, so
  *    a probe's partition filter is replayable by any engine (the
  *    cross-engine gate pins a probe bucket's content verbatim).
  *  - `components/` — (id, component) from min-label propagation over the
  *    pairs, the cluster resolution every keeper-selection consumes.
  *
  * A by-doc probe reads |probe buckets| / nBuckets of the pair bytes —
  * partition pruning at the scan, never the corpus, never any text.
  */
object PairsIndex {

  final case class Index(path: String, nBuckets: Int) {
    /** The full pair relation (doc_a, doc_b, jacc) from the layout. */
    def pairs(spark: SparkSession): DataFrame =
      graft.core.Layouts.read(spark, path + "/pairs")
        .select(col("doc_a"), col("doc_b"), col("jacc"))

    /** (id, component) cluster labels resolved at build time. */
    def components(spark: SparkSession): DataFrame =
      spark.read.parquet(path + "/components")

    /** Pairs whose LEFT doc falls in `bucket` — the partition-pruned probe
      * shape: the bucket id is a literal partition filter, so the scan
      * reads one of nBuckets partitions. (A by-doc-id probe is this with
      * `doc_a % nBuckets` computed driver-side plus an id filter.)
      */
    def probeBucket(spark: SparkSession, bucket: Long): DataFrame =
      graft.core.Layouts.read(spark, path + "/pairs")
        .where(col("pb") === bucket)
        .select(col("doc_a"), col("doc_b"), col("jacc"))
  }

  /** Build the index at `path`. The ngram-Jaccard kernel runs EXACTLY
    * once: the pair relation is checkpointed, feeds the partitioned
    * layout write and the component propagation, and the component labels
    * are persisted beside it. All knobs forward to [[Dedup.ngramJaccard]].
    */
  def build(docs: DataFrame, path: String, nBuckets: Int = 16,
            textCol: String = "text", idCol: String = "doc_id",
            shingleLen: Int = 5, blockPrefix: Int = 40,
            threshold: Double = 0.4, maxBlock: Int = 10000): Index = {
    val spark = docs.sparkSession
    val p = Dedup.ngramJaccard(docs, textCol, idCol, shingleLen,
      blockPrefix, threshold, maxBlock).localCheckpoint()
    graft.core.Layouts.writePartitioned(
      p.withColumn("pb", pmod(col("doc_a"), lit(nBuckets.toLong))),
      path + "/pairs", "pb")
    Dedup.connectedComponents(p)
      .write.mode("overwrite").parquet(path + "/components")
    import spark.implicits._
    Seq(nBuckets).toDF("n_buckets")
      .write.mode("overwrite").parquet(path + "/meta")
    Index(path, nBuckets)
  }

  def load(spark: SparkSession, path: String): Index =
    Index(path, spark.read.parquet(path + "/meta").collect().head.getInt(0))

  /** Load the index at `path` if a complete layout is there (the meta
    * parquet is written LAST by [[build]], so its presence implies the
    * pairs and components landed); None when absent — the probe callers
    * like [[Curation.run]] use to honour build-once/read-many.
    */
  def loadIfPresent(spark: SparkSession, path: String): Option[Index] = {
    val fs = new org.apache.hadoop.fs.Path(path + "/meta")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path + "/meta")))
      Some(load(spark, path))
    else None
  }
}
