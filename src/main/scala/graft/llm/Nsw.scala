package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-based ANN (the HNSW/NSW family) beside IVF/PQ/LSH — the
  * highest-recall-per-probe index family: a bounded-degree neighbour
  * graph over the corpus, probed by a greedy best-first walk from a
  * fixed entry point toward the query.
  *
  * Re-expressed Spark-first rather than as the classic single-machine
  * pointer structure:
  *
  *   - CONSTRUCTION is distributed the same way the IVF tier shards
  *     everything: vectors are assigned to kClusters coarse cells
  *     (frozen k-means, [[Similarity.ivfIndex]]) and the bounded-degree
  *     graph is built PER CLUSTER with the existing blocked kNN kernel
  *     ([[Similarity.knnGraph]] — pair joins keyed on (cluster,
  *     sub-bucket), never global all-pairs). Edges are symmetrized
  *     (union of both directions), so degree ≤ 2·`degree` — the NSW
  *     navigability fix for asymmetric kNN edges — and each cluster's
  *     ENTRY POINT is its medoid (the member nearest the centroid).
  *   - The PROBE is the greedy walk unrolled as `rounds` driver-planned
  *     expansion steps (the same pattern as [[graft.analytics.Graph]]'s
  *     PageRank): frontier := scored entry points of the `nprobe`
  *     routed clusters; each round joins the frontier (ef rows,
  *     broadcast) to the edge relation, scores the newly reached
  *     neighbours against the query, and keeps the best `ef` as the
  *     next frontier. All joins are keyed or broadcast — per-round
  *     shuffle volume is O(ef · degree), never corpus-sized — and with
  *     the cluster-partitioned vector layout the per-round id lookups
  *     touch only the routed clusters' partitions.
  *
  * Determinism: scores are edge-rounded (6 dp) with id tie-breaks at
  * every rank, so the walk visits one well-defined set. No SQL replay
  * exists for a greedy walk, so the gate is the recall harness
  * (ScalaTest): recall@k vs memoized brute force, and ≥ IVF at the same
  * probe budget on the planted geometry.
  */
object Nsw {

  /** A built NSW index: routing centroids, the id-keyed (double-cast)
    * vectors with their cluster, the bounded-degree edge relation, and
    * one entry point per cluster. Like [[Similarity.IvfIndex]], an
    * offline artifact — build once, probe many times.
    */
  final case class NswIndex(centroids: DataFrame, vectors: DataFrame,
                            edges: DataFrame, entries: DataFrame) {
    def save(path: String): Unit = {
      centroids.write.mode("overwrite").parquet(s"$path/centroids")
      vectors.write.mode("overwrite").parquet(s"$path/vectors")
      edges.write.mode("overwrite").parquet(s"$path/edges")
      entries.write.mode("overwrite").parquet(s"$path/entries")
    }
  }

  def load(spark: SparkSession, path: String): NswIndex =
    NswIndex(spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/vectors"),
      spark.read.parquet(s"$path/edges"),
      spark.read.parquet(s"$path/entries"))

  /** Build the index: coarse assignment (kClusters cells), per-cluster
    * bounded-degree kNN edges (symmetrized), per-cluster medoid entry
    * points. One corpus pass for assignment + one blocked pair join —
    * the same cost envelope as the IVF build plus the kNN kernel the
    * knn-graph gate already prices.
    */
  def build(embs: DataFrame, kClusters: Int, degree: Int = 6,
            iters: Int = 2, idCol: String = "vec_id",
            vecCol: String = "embedding", scale: Int = 6): NswIndex = {
    require(degree >= 1 && kClusters >= 1)
    val (assign, cents) = Similarity.ivfIndex(embs, kClusters, iters,
      idCol, vecCol)
    val vecs = embs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .join(assign, "id") // (id, v, cluster)
    val knn = Similarity.knnGraph(
      vecs.select(col("id").as(idCol), col("v").as(vecCol), col("cluster")),
      k = degree, partCol = "cluster", idCol = idCol, vecCol = vecCol,
      scale = scale)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"), col("sim"))
    // symmetrize, then RE-CAP: a kNN edge is one-directional (b may be
    // a's neighbour while a is far down b's list) and the walk must
    // traverse it from either end — but a hub's IN-degree is unbounded,
    // so after the union each node keeps only its 2·degree best edges
    // (HNSW's neighbour-list shrink). Cosine is symmetric, so the
    // reversed edge reuses the same rounded score.
    val sym = knn.union(knn.select(col("dst").as("src"),
      col("src").as("dst"), col("sim"))).distinct()
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("sim").desc, col("dst"))
    val edges = sym.withColumn("_r", row_number().over(dw))
      .where(col("_r") <= 2 * degree)
      .select("src", "dst")
    val entries = vecs.join(broadcast(cents), "cluster")
      .select(col("cluster"), col("id"),
        (graft.functions.native.dotd(col("v"), col("cvec")) /
          (sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) +
            lit(1e-12))).as("s"))
      .groupBy("cluster")
      .agg(max_by(col("id"), struct(col("s"), -col("id"))).as("entry_id"))
    // MATERIALIZE the index relations (build once, probe many times):
    // without this, every probe round's frontier⋈edges join would
    // re-execute the blocked kNN pair join — the costliest stage —
    // from scratch. localCheckpoint is eager and truncates lineage.
    NswIndex(cents.localCheckpoint(), vecs.localCheckpoint(),
      edges.localCheckpoint(), entries.localCheckpoint())
  }

  /** Greedy best-first probe, unrolled as `rounds` expansion steps with
    * beam width `ef`: route to the `nprobe` nearest clusters, start at
    * their entry points, expand the current beam's out-edges, score the
    * reached vectors, keep the best `ef` seen so far as the next beam.
    * Returns the top-`k` of every vector visited — same (id, sim)
    * schema and edge-rounding as the other similarity probes.
    */
  def topK(index: NswIndex, query: DataFrame, k: Int, nprobe: Int = 2,
           ef: Int = 32, rounds: Int = 3, scale: Int = 6): DataFrame = {
    require(k >= 1 && nprobe >= 1 && ef >= k && rounds >= 1,
      s"need k>=1, nprobe>=1, ef>=k, rounds>=1; got k=$k nprobe=$nprobe ef=$ef rounds=$rounds")
    val routed = query.crossJoin(broadcast(index.centroids))
      .select(col("cluster"),
        (graft.functions.native.dotd(
          col("qvec").cast("array<double>"), col("cvec")) /
          (sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) +
            lit(1e-12))).as("s"))
      .orderBy(col("s").desc, col("cluster")).limit(nprobe)
      .select("cluster")
    // score(ids): (id, sim) vs the broadcast one-row query — the id
    // lookup is a broadcast-keyed semi join into the vector relation
    // (cluster-pruned under a partitioned layout)
    def score(ids: DataFrame): DataFrame =
      index.vectors.join(broadcast(ids), "id")
        .crossJoin(broadcast(query))
        .select(col("id"), graft.functions.Rounding.dround(
          graft.functions.native.dotd(col("v"),
            col("qvec").cast("array<double>")) /
            (sqrt(graft.functions.native.dotd(col("v"), col("v"))) *
              sqrt(graft.functions.native.dotd(
                col("qvec").cast("array<double>"),
                col("qvec").cast("array<double>"))) + lit(1e-12)),
          scale).as("sim"))
    var visited = score(index.entries
      .join(broadcast(routed), "cluster")
      .select(col("entry_id").as("id"))).localCheckpoint()
    for (_ <- 1 to rounds) {
      val beam = visited.orderBy(col("sim").desc, col("id")).limit(ef)
      val reached = beam.select(col("id").as("src"))
        .join(index.edges, "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
      // checkpoint per round: the walk's lineage would otherwise replay
      // every earlier round inside each later one (the PageRank rule)
      visited = visited.union(score(reached)).localCheckpoint()
    }
    visited.orderBy(col("sim").desc, col("id")).limit(k)
  }
}
