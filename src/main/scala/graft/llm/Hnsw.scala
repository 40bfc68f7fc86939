package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HIERARCHICAL graph ANN (HNSW, Malkov & Yashunin 2016) layered on top
  * of the flat [[Nsw]] graph: a stack of bounded-degree graphs where
  * layer 0 holds every vector and each layer above holds a ~1/M
  * deterministic subsample of the one below. A probe DESCENDS — a short
  * cheap walk on each sparse upper layer positions the entry for the
  * layer below — so the beam budget that a flat NSW spends wandering
  * toward the query's neighbourhood becomes logarithmic positioning
  * plus one short layer-0 walk.
  *
  * Spark-first construction, same sharding posture as the whole
  * similarity tier:
  *
  *   - LEVELS are a deterministic function of the id (the number of
    *   leading base-M "zeros" of a 32-bit murmur hash — the same
  *     geometric distribution HNSW samples randomly, replayable on any
  *     engine): level ≥ l for ~N/M^l vectors.
  *   - EACH LAYER's bounded-degree graph is built per IVF cluster with
  *     the blocked kNN kernel ([[Similarity.knnGraph]]), symmetrized and
  *     re-capped at 2·degree, exactly like [[Nsw.build]] — the layer
  *     sizes form a geometric series, so the whole stack costs
  *     ~M/(M−1) of the flat build.
  *   - ENTRY POINTS: per cluster, the member of its TOPMOST occupied
  *     layer nearest the centroid (upper-layer membership is id-hash
  *     driven, so every cluster's top layer is well defined).
  *
  * The PROBE routes to `nprobe` clusters (the family's coarse tier),
  * then descends: at each upper layer one expand-and-rescore round with
  * a narrow beam (`efUpper`), at layer 0 the standard `rounds`×`ef`
  * greedy walk seeded by the descended beam. Every join is keyed or
  * broadcast; per-round shuffle is O(beam · degree). Determinism as in
  * [[Nsw]]: edge-rounded scores with id tie-breaks at every rank.
  *
  * No SQL replay exists for a layered greedy walk, so the gate is the
  * recall harness: recall@k ≥ the flat NSW walk at EQUAL layer-0 probe
  * budget, determinism, save/load (LlmSpec).
  */
object Hnsw {

  /** A built HNSW index: routing centroids, id-keyed vectors (with
    * cluster and level), one edge relation PER LAYER (index 0 = base),
    * and per-cluster entry points (id + its topmost layer).
    */
  final case class HnswIndex(centroids: DataFrame, vectors: DataFrame,
                             layers: Seq[DataFrame], entries: DataFrame) {
    def save(path: String): Unit = {
      centroids.write.mode("overwrite").parquet(s"$path/centroids")
      vectors.write.mode("overwrite").parquet(s"$path/vectors")
      entries.write.mode("overwrite").parquet(s"$path/entries")
      layers.zipWithIndex.foreach { case (e, l) =>
        e.write.mode("overwrite").parquet(s"$path/edges$l")
      }
      val spark = centroids.sparkSession
      spark.range(1).select(lit(layers.size).as("n"))
        .write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  def load(spark: SparkSession, path: String): HnswIndex = {
    val n = spark.read.parquet(s"$path/meta").head().getInt(0)
    HnswIndex(spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/vectors"),
      (0 until n).map(l => spark.read.parquet(s"$path/edges$l")),
      spark.read.parquet(s"$path/entries"))
  }

  /** Deterministic HNSW level of an id column: leading base-M zeros of
    * the murmur hash — P(level ≥ l) ≈ M^-l, the geometric layer law.
    */
  private def levelOf(id: org.apache.spark.sql.Column, m: Int,
                      maxLevel: Int): org.apache.spark.sql.Column = {
    val h = pmod(hash(id).cast("long"), lit(Int.MaxValue.toLong))
    (0 until maxLevel).foldLeft(lit(0)) { (acc, l) =>
      val span = math.pow(m.toDouble, (l + 1).toDouble).toLong
      when(pmod(h, lit(span)) === 0, lit(l + 1)).otherwise(acc)
    }
  }

  /** Build the layered index. `m` is the layer decimation factor (HNSW's
    * M-ish level multiplier); layers stop when fewer than two members
    * remain. One corpus pass for assignment, then one blocked kNN build
    * per layer over a geometrically shrinking relation.
    */
  def build(embs: DataFrame, kClusters: Int, degree: Int = 6, m: Int = 4,
            iters: Int = 2, idCol: String = "vec_id",
            vecCol: String = "embedding", scale: Int = 6): HnswIndex = {
    require(degree >= 1 && kClusters >= 1 && m >= 2)
    val (assign, cents) = Similarity.ivfIndex(embs, kClusters, iters,
      idCol, vecCol)
    val maxLevelCap = 12 // M^12 ≥ 16M even at m=4 — beyond any layer 0 size
    val vecs = embs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .join(assign, "id")
      .withColumn("level", levelOf(col("id"), m, maxLevelCap))
      .localCheckpoint() // one pass; reused by every layer build below
    def layerEdges(l: Int): DataFrame = {
      val members = vecs.where(col("level") >= l)
        .select(col("id").as(idCol), col("v").as(vecCol), col("cluster"))
      val knn = Similarity.knnGraph(members, k = degree,
        partCol = "cluster", idCol = idCol, vecCol = vecCol, scale = scale)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"), col("sim"))
      val sym = knn.union(knn.select(col("dst").as("src"),
        col("src").as("dst"), col("sim"))).distinct()
      val dw = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(col("sim").desc, col("dst"))
      sym.withColumn("_r", row_number().over(dw))
        .where(col("_r") <= 2 * degree)
        .select("src", "dst")
        .localCheckpoint()
    }
    val layers = scala.collection.mutable.ArrayBuffer(layerEdges(0))
    var l = 1
    var more = true
    while (more && l <= maxLevelCap) {
      if (vecs.where(col("level") >= l).limit(2).count() < 2) more = false
      else { layers += layerEdges(l); l += 1 }
    }
    // per-cluster entry: the member of the cluster's TOPMOST occupied
    // layer nearest the centroid (id tie-break)
    val topw = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(col("level").desc, col("s").desc, col("id"))
    val entries = vecs.join(broadcast(cents), "cluster")
      .select(col("cluster"), col("id"), col("level"),
        (graft.functions.native.dotd(col("v"), col("cvec")) /
          (sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) +
            lit(1e-12))).as("s"))
      .withColumn("_r", row_number().over(topw))
      .where(col("_r") === 1)
      .select(col("cluster"), col("id").as("entry_id"))
    HnswIndex(cents.localCheckpoint(), vecs, layers.toSeq,
      entries.localCheckpoint())
  }

  /** Layered greedy probe: route to `nprobe` clusters, DESCEND the layer
    * stack (one expand-and-rescore round per upper layer, beam
    * `efUpper`), then run the standard `rounds`×`ef` walk on layer 0
    * seeded by the descent. Returns top-`k` `(id, sim)`, same schema and
    * rounding as every similarity probe.
    */
  def topK(index: HnswIndex, query: DataFrame, k: Int, nprobe: Int = 2,
           ef: Int = 32, rounds: Int = 3, efUpper: Int = 4,
           scale: Int = 6): DataFrame = {
    require(k >= 1 && nprobe >= 1 && ef >= k && rounds >= 1 && efUpper >= 1,
      s"need k>=1, nprobe>=1, ef>=k, rounds>=1, efUpper>=1; " +
        s"got k=$k nprobe=$nprobe ef=$ef rounds=$rounds efUpper=$efUpper")
    val routed = query.crossJoin(broadcast(index.centroids))
      .select(col("cluster"),
        (graft.functions.native.dotd(
          col("qvec").cast("array<double>"), col("cvec")) /
          (sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) +
            lit(1e-12))).as("s"))
      .orderBy(col("s").desc, col("cluster")).limit(nprobe)
      .select("cluster")
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
    def expand(beam: DataFrame, edges: DataFrame,
               seen: DataFrame): DataFrame =
      beam.select(col("id").as("src"))
        .join(edges, "src")
        .select(col("dst").as("id")).distinct()
        .join(seen.select("id"), Seq("id"), "left_anti")
    // descent: narrow one-round walks on the sparse upper layers
    var visited = score(index.entries
      .join(broadcast(routed), "cluster")
      .select(col("entry_id").as("id"))).localCheckpoint()
    for (l <- (index.layers.size - 1) to 1 by -1) {
      val beam = visited.orderBy(col("sim").desc, col("id")).limit(efUpper)
      visited = visited
        .union(score(expand(beam, index.layers(l), visited)))
        .localCheckpoint() // truncate walk lineage (the PageRank rule)
    }
    // layer-0 walk, seeded by wherever the descent landed
    for (_ <- 1 to rounds) {
      val beam = visited.orderBy(col("sim").desc, col("id")).limit(ef)
      visited = visited
        .union(score(expand(beam, index.layers.head, visited)))
        .localCheckpoint()
    }
    visited.orderBy(col("sim").desc, col("id")).limit(k)
  }
}
