package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Float elements are cast to double *before* any arithmetic. Dot products
  * agree with the DuckDB oracle's list_inner_product within 1 ulp (DuckDB
  * accumulates pairwise, ours sequentially — pinned by CrossEngineSpec), so
  * every similarity score is rounded (6 dp) before comparison or ranking.
  *
  * Scale path: brute-force top-k is a map + single top-k reduce (no shuffle
  * of the corpus; `ORDER BY … LIMIT k` is planned as TakeOrderedAndProject,
  * per-partition heaps + driver merge of k×partitions rows). The
  * bucketed/IVF variants cut the scanned fraction for repeated queries.
  */
object Similarity {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Left-to-right dot product (native expression; within 1 ulp of the
    * oracle's pairwise-accumulated list_inner_product).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.native.dotd(asD(a), asD(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbours of a single query vector (given as
    * a one-row DataFrame `(qvec)`): the exact baseline. The query side is
    * broadcast; ties broken by id.
    */
  def topK(embs: DataFrame, query: DataFrame, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding",
           scale: Int = 6): DataFrame =
    embs.crossJoin(broadcast(query))
      .select(col(idCol),
        graft.functions.Rounding.dround(cosine(col(vecCol), col("qvec")), scale).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Per-vector rows `(p, sk, id, v, nrm)` for the blocked pair joins: the
    * block key is (partition, sub-key), where the sub-key is 0 for blocks of
    * at most `maxBlock` rows (exact all-pairs within the block) and an
    * LSH bucket ([[lshKey]], `subBits` sign bits) for larger ones. A pair
    * join on (p, sk) is therefore quadratic only up to the DOCUMENTED bound
    * max(maxBlock, hotBlock/2^subBits expected) — a hot partition key can no
    * longer OOM an executor with an unbounded n² block; beyond the bound the
    * comparison becomes LSH-approximate (near-identical vectors share
    * buckets with high probability). The block-size relation is one row per
    * partition key (broadcast: partition keys ≪ corpus by construction).
    */
  private def guardedBlocks(embs: DataFrame, partCol: String, idCol: String,
                            vecCol: String, maxBlock: Int, subBits: Int): DataFrame = {
    // Cast to double and precompute each vector's norm once — the pair loop
    // then does a single dot per pair instead of three.
    val keyed = embs.select(col(partCol).as("p"), col(idCol).as("id"),
      asD(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(graft.functions.native.dotd(col("v"), col("v"))))
    val sizes = keyed.groupBy("p").agg(count(lit(1)).as("_bn"))
    keyed.join(broadcast(sizes), "p")
      .withColumn("sk",
        when(col("_bn") > maxBlock, graft.functions.native.lshKey(col("v"), subBits))
          .otherwise(lit(0L)))
      .drop("_bn")
  }

  /** Nearest neighbour per vector within a coarse partition (here the
    * `label` column stands in for an IVF cluster assignment): the shuffle is
    * by partition key only, never all-pairs global, and blocks larger than
    * `maxBlock` are sub-bucketed by LSH key ([[guardedBlocks]]) so no single
    * block is ever quadratic beyond the bound — for those blocks the
    * neighbour is LSH-approximate, and a vector alone in its sub-bucket
    * yields no row.
    */
  def nnWithinPartition(embs: DataFrame, partCol: String = "label",
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        scale: Int = 6, maxBlock: Int = 10000,
                        subBits: Int = 8): DataFrame =
    knnGraph(embs, 1, partCol, idCol, vecCol, scale, maxBlock, subBits)
      .select(col("vec_id").as("a_id"), col("nbr_id").as("b_id"), col("sim"))

  /** k-nearest-neighbour graph within a coarse partition — the SemDeDup /
    * dataset-cartography primitive: for EVERY vector, its top-`k` cosine
    * neighbours. Blocked exactly like [[nnWithinPartition]]: the pair join
    * is keyed on (partition, sub-bucket) — never global all-pairs — and
    * blocks beyond `maxBlock` are LSH-sub-bucketed, making those blocks'
    * neighbourhoods LSH-approximate with per-block quadratic cost bounded.
    * The per-source top-k is a `row_number` over a corpus-keyed window
    * (state = k rows per source, partition-invariant). Ranking is on the
    * ROUNDED similarity with the neighbour id as tiebreak, so the graph is
    * deterministic and engine-portable; a vector alone in its sub-bucket
    * contributes no rows.
    */
  def knnGraph(embs: DataFrame, k: Int = 3, partCol: String = "label",
               idCol: String = "vec_id", vecCol: String = "embedding",
               scale: Int = 6, maxBlock: Int = 10000,
               subBits: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = guardedBlocks(embs, partCol, idCol, vecCol, maxBlock, subBits)
    val a = keyed.select(col("p"), col("sk"), col("id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_n"))
    val b = keyed.select(col("p"), col("sk"), col("id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_n"))
    val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id"))
    a.join(b, Seq("p", "sk")).where(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.Rounding.dround(graft.functions.native.dotd(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")), scale)
          .as("sim"))
      .withColumn("_rank", row_number().over(w)) // filter on the RAW rank
      .where(col("_rank") <= k) // attr so the group-limit rule applies
      .select(col("a_id").as("vec_id"), col("b_id").as("nbr_id"),
        col("_rank").cast("long").as("rank"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs (sim ≥ `threshold`) blocked by a
    * coarse partition, with the same [[guardedBlocks]] size bound: exact
    * all-pairs within blocks up to `maxBlock`, LSH-sub-bucketed beyond.
    */
  def nearDupPairs(embs: DataFrame, partCol: String = "label",
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   threshold: Double = 0.4, scale: Int = 6,
                   maxBlock: Int = 10000, subBits: Int = 8): DataFrame = {
    val keyed = guardedBlocks(embs, partCol, idCol, vecCol, maxBlock, subBits)
    val a = keyed.select(col("p"), col("sk"), col("id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = keyed.select(col("p"), col("sk"), col("id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("p", "sk")).where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        graft.functions.Rounding.dround(
          graft.functions.native.dotd(col("va"), col("vb")) / (col("na") * col("nb")), scale)
          .as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Random-hyperplane LSH bucket key (`nBits` sign bits); native expression
    * with deterministic splitmix64 planes.
    */
  def lshKey(vecCol: Column, nBits: Int): Column =
    graft.functions.native.lshKey(asD(vecCol), nBits)

  /** Distributed IVF index: k-means with deterministic init
    * (cluster₀ = id mod k) and `iters` Lloyd iterations. Everything is
    * joins + aggregates: assignment is a broadcast of the k centroids
    * (k ≪ corpus); the centroid update is one shuffle keyed on cluster with
    * map-side-combined VectorSumD partials — never all-pairs.
    * Returns (assignments(id, cluster), centroids(cluster, cvec)).
    */
  def ivfIndex(embs: DataFrame, kClusters: Int, iters: Int = 2,
               idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    val v = embs.select(col(idCol).as("id"), asD(col(vecCol)).as("v"))
    var assign = v.select(col("id"), pmod(col("id"), lit(kClusters)).cast("int").as("cluster"))
    var prev: DataFrame = null
    var centroids: DataFrame = null
    for (it <- 0 to iters) {
      // Iterative-algorithm caching done right: cache AND materialize each
      // round's (id, cluster) relation (tiny — two ints per vector) before
      // dropping the previous round's. A lazy cache() alone never
      // materializes inside the loop, so unpersisting the predecessor would
      // silently reintroduce the per-round lineage re-execution.
      if (it > 0) {
        assign = assign.cache()
        assign.count()
        if (prev != null) prev.unpersist()
        prev = assign
      }
      // One shuffle keyed on cluster, map-side-combined vector partials
      // (the posexplode formulation shuffles one row per (vector, dim) and
      // needs a second shuffle to re-assemble the arrays).
      // Centroid components are QUANTIZED to 6 dp (binary-value rounding):
      // the mean's float-summation order differs across partial-aggregation
      // plans and engines by ~1 ulp, and rounding absorbs it — the index
      // (and so every probe) becomes bit-reproducible cross-engine, the same
      // trick the embed_centroids oracle pins.
      centroids = v.join(assign, "id")
        .groupBy("cluster")
        .agg(graft.functions.native.vecsum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"),
          transform(col("s"), x => graft.functions.Rounding.dround(x / col("n"), 6)).as("cvec"))
      assign = v.crossJoin(broadcast(centroids))
        .select(col("id"), col("cluster"),
          graft.functions.native.dotd(col("v"), col("cvec"))
            ./(sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) + lit(1e-12))
            .as("sim"))
        .groupBy("id").agg(max_by(col("cluster"), struct(col("sim"), -col("cluster"))).as("cluster"))
    }
    // Hand back a CACHED final assignment and drop the loop's last interim
    // cache — otherwise (iters ≥ 1) that predecessor's blocks stay resident
    // for the session and IvfIndex.unpersist() can never release them.
    if (prev != null) {
      assign = assign.cache(); assign.count(); prev.unpersist()
    }
    (assign, centroids)
  }

  /** Symmetric int8 quantization of an embedding column — the storage/ANN
    * prep that cuts a vector corpus 4× before indexing: per-vector scale =
    * max|x|/127, q_i = round(x_i/scale) ∈ [-127, 127] (binary-value HALF-UP,
    * DuckDB's round formulation). All arithmetic is per-row and
    * order-independent (max is comparison-based), so the quantized corpus is
    * bit-identical across engines and partitionings. The kernel is a native
    * expression ([[graft.functions.Int8Quantize]]) reading the float array
    * directly — the aggregate()+transform() HOF form pays an interpreted
    * lambda frame per element, dim × rows frames per pass.
    * Returns `(id, qvec array<int>, scale)`; dequantize ≈ q_i·scale.
    */
  def quantizeInt8(embs: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    embs.select(col(idCol).as("id"),
      graft.functions.native.int8quant(col(vecCol)).as("qvec"),
      graft.functions.native.int8scale(col(vecCol)).as("scale"))

  /** Per-label centroid DRIFT between two embedding snapshots — the
    * embedding-space counterpart of [[graft.profile.Psi]]'s scalar drift
    * tests: cosine between each label's mean vector in snapshot `a` vs
    * snapshot `b` (a re-embedded corpus, a new crawl, a model upgrade).
    * Cosine of the SUM vectors equals cosine of the means (counts cancel),
    * so no per-component division happens before the single dot products.
    * Returns `(labelCol, n_a, n_b, cos)`, cos rounded 6 dp.
    *
    * Scale shape: each 100 TB side collapses via the map-side-combined
    * [[graft.functions.VectorSumD]] aggregate to one dim-length row per
    * label; the join and cosine touch label-cardinality rows only.
    */
  def centroidDrift(a: DataFrame, b: DataFrame, labelCol: String = "label",
                    vecCol: String = "embedding"): DataFrame = {
    def side(df: DataFrame, sv: String, n: String) =
      df.groupBy(labelCol).agg(
        graft.functions.native.vecsum(asD(col(vecCol))).as(sv),
        count(lit(1)).as(n))
    side(a, "_sa", "n_a").join(side(b, "_sb", "n_b"), labelCol)
      .select(col(labelCol), col("n_a"), col("n_b"),
        graft.functions.Rounding.dround(
          graft.functions.native.dotd(col("_sa"), col("_sb")) /
            (sqrt(graft.functions.native.dotd(col("_sa"), col("_sa"))) *
             sqrt(graft.functions.native.dotd(col("_sb"), col("_sb")))), 6)
          .as("cos"))
  }

  /** Random-sign (Johnson–Lindenstrauss) projection to `outDim`
    * dimensions — the cheap dimensionality-reduction front-end for coarse
    * ANN blocking and dedup keys: one row-local
    * [[graft.functions.RandomSignProject]] pass (integer micro-unit sums,
    * bit-reproducible cross-engine), zero shuffle at any corpus size.
    * Output is long form `(id, dim, value)` — value = micro-sum / 1e6,
    * rounded 6 dp.
    */
  def randomProject(embs: DataFrame, outDim: Int = 8,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame =
    embs.select(col(idCol),
        graft.functions.native.randomSignProject(asD(col(vecCol)), outDim)
          .as("_p"))
      .select(col(idCol), posexplode(col("_p")))
      .select(col(idCol), col("pos").cast("long").as("dim"),
        graft.functions.Rounding.dround(col("col") / 1000000.0, 6)
          .as("value"))

  /** Exact covariance matrix of the embedding column — the sufficient
    * statistic behind PCA/whitening/anisotropy diagnostics. Vectors are
    * quantized to EXACT 10⁻³-unit integers ([[graft.functions.QuantMillis]]);
    * ONE wide aggregate sums n, the component sums, and the
    * [[graft.functions.OuterProductMillis]] upper-triangle second moments
    * (all map-side combined — a 100 TB covariance is one scan + one
    * exchange of d(d+1)/2 doubles per task, order-invariant and
    * bit-identical cross-engine). The assembled relation is `(i, j, cov)`
    * over the upper triangle, cov = (Sᵢⱼ/n − (Sᵢ/n)(Sⱼ/n)) / 10⁶ rounded
    * 6 dp — the d²-bounded OUTPUT is built driver-side (config-bounded
    * collect, the toBounds convention).
    */
  def covariance(embs: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val spark = embs.sparkSession
    val v = asD(col(vecCol))
    val row = embs.agg(
      count(lit(1)).as("n"),
      graft.functions.native.vecsum(graft.functions.native.quantMillis(v)).as("s"),
      graft.functions.native.vecsum(graft.functions.native.outerProductMillis(v)).as("sp"))
      .collect().head
    import spark.implicits._
    if (row.getLong(0) == 0L) // empty corpus: no moments, empty relation
      return Seq.empty[(Long, Long, Double)].toDF("i", "j", "cov")
    val n = row.getLong(0).toDouble
    val s = row.getSeq[Double](1).toArray
    val sp = row.getSeq[Double](2).toArray
    val d = s.length
    // driver twin of Rounding.dround(_, 6): binary-value half-away rounding
    def r6(x: Double): Double =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -(math.floor(-x * 1e6 + 0.5) / 1e6)
    val out = Seq.newBuilder[(Long, Long, Double)]
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = (sp(k) / n - (s(i) / n) * (s(j) / n)) / 1000000.0
        out += ((i.toLong, j.toLong, r6(cov)))
        k += 1; j += 1
      }
      i += 1
    }
    out.result().toDF("i", "j", "cov")
  }

  /** A fitted PCA model: eigenvalues (descending) and the matching
    * orthonormal components (rows), from the exact [[covariance]].
    */
  final case class PcaModel(eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Exact PCA of the embedding column: the [[covariance]] statistic
    * (one distributed pass) eigendecomposed driver-side by cyclic JACOBI
    * rotations — deterministic (fixed sweep order, fixed threshold) and
    * d×d-bounded, the same artifact-sized-driver-work posture as BPE's
    * merge loop. Returns the top `k` components by eigenvalue
    * (descending; ties broken by original dimension order).
    *
    * Spec-gated (the iterative eigensolver has no SQL replay): planted
    * anisotropic data recovers its dominant direction, components are
    * orthonormal, and C·v = λ·v holds within tolerance.
    */
  def pca(embs: DataFrame, k: Int, idCol: String = "vec_id",
          vecCol: String = "embedding"): PcaModel = {
    val covRows = covariance(embs, idCol, vecCol).collect()
    val d = (math.sqrt(8.0 * covRows.length + 1) - 1).toInt / 2
    val c = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    // cyclic Jacobi: rotate out each off-diagonal (p, q) in row-major
    // order until the off-diagonal mass is numerically zero
    val vMat = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = c(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-15) {
            val theta = (c(q)(q) - c(p)(p)) / (2 * apq)
            val t =
              if (theta == 0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1))
            val cs = 1 / math.sqrt(t * t + 1)
            val sn = t * cs
            var i = 0
            while (i < d) {
              val cip = c(i)(p); val ciq = c(i)(q)
              c(i)(p) = cs * cip - sn * ciq
              c(i)(q) = sn * cip + cs * ciq
              i += 1
            }
            i = 0
            while (i < d) {
              val cpi = c(p)(i); val cqi = c(q)(i)
              c(p)(i) = cs * cpi - sn * cqi
              c(q)(i) = sn * cpi + cs * cqi
              val vip = vMat(i)(p); val viq = vMat(i)(q)
              vMat(i)(p) = cs * vip - sn * viq
              vMat(i)(q) = sn * vip + cs * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-c(i)(i), i)).take(k)
    PcaModel(order.map(i => c(i)(i)).toArray,
      order.map(i => (0 until d).map(vMat(_)(i)).toArray).toArray)
  }

  /** Project the embedding column onto a fitted [[PcaModel]] — long-form
    * `(id, pc, value)`: one codegen'd [[graft.functions.DotProductD]] per
    * component against a literal component vector, zero shuffle.
    */
  def pcaProject(embs: DataFrame, model: PcaModel,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val v = asD(col(vecCol))
    val pcs = model.components.zipWithIndex.map { case (comp, i) =>
      graft.functions.native.dotd(v,
        array(comp.map(x => lit(x)).toIndexedSeq: _*)).as(s"_pc$i")
    }
    embs.select((col(idCol) +: pcs.toIndexedSeq): _*)
      .select(col(idCol), posexplode(array(
        model.components.indices.map(i => col(s"_pc$i")): _*)))
      .select(col(idCol), col("pos").cast("long").as("pc"),
        col("col").as("value"))
  }

  /** Mahalanobis (WHITENED-distance) embedding outliers — the OOD /
    * corrupted-vector gate Euclidean norms miss: a vector of modest norm
    * lying along a low-variance direction is many sigma out, while a
    * large vector along the dominant direction is ordinary. Distance² =
    * Σᵢ projᵢ² / max(λᵢ, `minVar`) over the [[pca]] basis (the mean is
    * removed first — Mahalanobis is about the centered cloud). Flags
    * vectors with distance ≥ `threshold` (in sigma units).
    *
    * Scale shape: the model is a fitted artifact (one covariance pass +
    * d×d driver eigen); scoring is ONE projection pass — k codegen'd dots
    * per row against literal component vectors, zero shuffle beyond the
    * final flag filter. Spec-gated like [[pca]].
    */
  def mahalanobisOutliers(embs: DataFrame, k: Int = 8,
                          threshold: Double = 4.0, minVar: Double = 1e-9,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val spark = embs.sparkSession
    val model = pca(embs, k)
    if (model.eigenvalues.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Double)].toDF(idCol, "mdist")
    }
    // center on the mean (exact 1e-3-quantized mean, matching covariance)
    val meanRow = embs.agg(
        count(lit(1)).as("n"),
        graft.functions.native.vecsum(
          graft.functions.native.quantMillis(asD(col(vecCol)))).as("s"))
      .collect().head
    val n = meanRow.getLong(0).toDouble
    val mean = meanRow.getSeq[Double](1).toArray.map(_ / n / 1000.0)
    val v = asD(col(vecCol))
    val centered = array(mean.indices.map(i =>
      element_at(v, i + 1) - lit(mean(i))): _*)
    val dist2 = model.components.zipWithIndex.map { case (comp, i) =>
      val proj = graft.functions.native.dotd(centered,
        array(comp.map(x => lit(x)).toIndexedSeq: _*))
      proj * proj / lit(math.max(model.eigenvalues(i), minVar))
    }.reduce(_ + _)
    embs.select(col(idCol), sqrt(dist2).as("mdist"))
      .where(col("mdist") >= threshold)
  }

  /** Approximate cosine top-k over INT8-QUANTIZED codes — the search that
    * consumes [[quantizeInt8]]'s 4×-smaller corpus. Per-vector scales
    * cancel in cosine, so scoring is integer dot products only (cast to
    * double: magnitudes ≤ 127²·dim ≪ 2^53, every accumulation order is
    * EXACT — the one similarity score with no cross-engine float subtlety
    * before the edge round). `codes` is [[quantizeInt8]] output;
    * `queryCodes` is a one-row `(qq array<int>)` frame.
    */
  def topKInt8(codes: DataFrame, queryCodes: DataFrame, k: Int,
               idCol: String = "id", scale: Int = 6): DataFrame = {
    def dot(a: Column, b: Column) =
      graft.functions.native.dotd(asD(a), asD(b))
    codes.crossJoin(broadcast(queryCodes))
      .select(col(idCol),
        graft.functions.Rounding.dround(
          dot(col("qvec"), col("qq")) /
            (sqrt(dot(col("qvec"), col("qvec"))) *
              sqrt(dot(col("qq"), col("qq"))) + lit(1e-12)), scale).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** A built IVF index: `(id, cluster)` assignments + `(cluster, cvec)`
    * centroids, materialized ONCE (cached or persisted to storage) and
    * reused by every [[ivfTopK]] probe — rebuilding the index inside each
    * query is a full corpus pass per probe, the classic indexing
    * anti-pattern at scale.
    *
    * `clusteredVectors`, when present, is the 100 TB probe layout: the
    * vector corpus REWRITTEN `partitionBy(cluster)` ([[buildClusteredIvfIndex]]),
    * so a probe's `cluster IN (…)` filter prunes at the SCAN and each query
    * reads only its `nprobe` partitions' bytes. Without it the probe must
    * join the full corpus to the assignments relation — correct, but every
    * probe pays a full-corpus I/O pass, which is precisely what an IVF
    * index exists to avoid.
    */
  final case class IvfIndex(assignments: DataFrame, centroids: DataFrame,
                            clusteredVectors: Option[DataFrame] = None) {
    /** Persist to storage for reuse across sessions/jobs. */
    def save(path: String): Unit = {
      assignments.write.mode("overwrite").parquet(s"$path/assignments")
      centroids.write.mode("overwrite").parquet(s"$path/centroids")
    }
    def unpersist(): Unit = { assignments.unpersist(); centroids.unpersist(); () }
  }

  /** Build and MATERIALIZE the IVF index (cache + count): subsequent probes
    * read the cached relations — no k-means pass appears in any query plan.
    */
  def buildIvfIndex(embs: DataFrame, kClusters: Int, iters: Int = 0,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : IvfIndex = {
    val (assign, cents) = ivfIndex(embs, kClusters, iters, idCol, vecCol)
    val a = assign.persist(); val c = cents.persist()
    c.count(); a.count()
    IvfIndex(a, c)
  }

  /** Build the index AND rewrite the vector corpus `partitionBy(cluster)`
    * under `path/vectors` — the one-time layout job (one corpus pass, like
    * any silver rewrite) that turns every subsequent probe from a
    * full-corpus shuffle join into an `nprobe`-partition pruned scan.
    * Assignments/centroids land beside it, so [[loadIvfIndex]] restores the
    * whole artifact with zero corpus passes.
    */
  def buildClusteredIvfIndex(embs: DataFrame, kClusters: Int, path: String,
                             iters: Int = 0, idCol: String = "vec_id",
                             vecCol: String = "embedding"): IvfIndex = {
    val spark = embs.sparkSession
    val idx = buildIvfIndex(embs, kClusters, iters, idCol, vecCol)
    graft.core.Layouts.writePartitioned(
      embs.join(idx.assignments.withColumnRenamed("id", idCol), idCol),
      s"$path/vectors", "cluster")
    idx.save(path)
    idx.copy(clusteredVectors =
      Some(graft.core.Layouts.read(spark, s"$path/vectors")))
  }

  /** Nearest-centroid assignment against a FROZEN centroid relation
    * (broadcast — k rows): `(id, cluster)` with the same unrounded-cosine
    * argmax and (sim, −cluster) tie-break as the training loop, so an
    * appended batch lands exactly where a full rebuild with these
    * centroids would put it.
    */
  def assignToCentroids(embs: DataFrame, centroids: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame =
    embs.select(col(idCol).as("id"), asD(col(vecCol)).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("cluster"),
        (graft.functions.native.dotd(col("v"), col("cvec"))
          ./(sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) + lit(1e-12)))
          .as("sim"))
      .groupBy("id")
      .agg(max_by(col("cluster"), struct(col("sim"), -col("cluster"))).as("cluster"))

  /** Incremental index maintenance — the new-crawl lifecycle: assign a new
    * batch to the EXISTING centroids and APPEND it to the persisted
    * clustered layout + assignments relation. Cost is O(batch): no k-means
    * pass, and the indexed corpus is never re-read — the same posture as
    * [[SignatureStore]] on the dedup side. Centroids are deliberately
    * FROZEN: probe routing must agree with where vectors were physically
    * written, so distribution drift is handled by a periodic full rebuild
    * (the compaction analog), never by moving centroids under a live
    * layout. Returns the refreshed index handle (reloaded relations).
    */
  def appendToIvfIndex(index: IvfIndex, path: String, batch: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): IvfIndex = {
    val spark = batch.sparkSession
    val asg = assignToCentroids(batch, index.centroids, idCol, vecCol)
    graft.core.Layouts.writePartitioned(
      batch.join(asg.withColumnRenamed("id", idCol), idCol),
      s"$path/vectors", "cluster", mode = "append")
    asg.write.mode("append").parquet(s"$path/assignments")
    IvfIndex(spark.read.parquet(s"$path/assignments"), index.centroids,
      Some(graft.core.Layouts.read(spark, s"$path/vectors")))
  }

  /** Reload a [[IvfIndex.save]]d index: probes run against storage with no
    * corpus pass at all. Picks up the cluster-partitioned vector layout if
    * [[buildClusteredIvfIndex]] wrote one.
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val vecDir = new org.apache.hadoop.fs.Path(s"$path/vectors")
    val fs = vecDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    IvfIndex(spark.read.parquet(s"$path/assignments"),
      spark.read.parquet(s"$path/centroids"),
      if (fs.exists(vecDir))
        Some(graft.core.Layouts.read(spark, s"$path/vectors"))
      else None)
  }

  /** ANN top-k through a prebuilt [[IvfIndex]]: rank the query against the k
    * centroids (broadcast — k rows), search only the `nprobe` nearest
    * clusters. The index is NOT rebuilt.
    *
    * With a [[buildClusteredIvfIndex]] layout, the probed cluster ids (an
    * nprobe-sized, config-bounded driver collect off the k-row centroid
    * ranking) become a LITERAL `cluster IN (…)` partition filter on the
    * cluster-partitioned vector scan — the scan itself reads only
    * ~nprobe/kClusters of the corpus bytes (Explain-asserted in LlmSpec).
    * Without the layout, the probe falls back to joining the full corpus
    * against the assignments relation: compute after the join is still
    * nprobe/k of the corpus, but the scan + shuffle is 100% — the fallback
    * exists for ad-hoc exploration, not the scale path.
    */
  def ivfTopK(index: IvfIndex, embs: DataFrame, query: DataFrame, k: Int,
              nprobe: Int, idCol: String, vecCol: String,
              scale: Int): DataFrame = {
    val probed = query.crossJoin(broadcast(index.centroids))
      .select(col("qvec"), col("cluster"),
        (graft.functions.native.dotd(asD(col("qvec")), col("cvec")) /
          (sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) + lit(1e-12))).as("sim"))
      .orderBy(col("sim").desc, col("cluster")).limit(nprobe) // cluster tie-break: deterministic probe set
      .select(col("qvec"), col("cluster"))
    val candidates = index.clusteredVectors match {
      case Some(cv) =>
        // nprobe cluster ids: a config-bounded collect (the ranking relation
        // has kClusters rows), pushed down as a partition-pruning literal.
        val probeIds = probed.select("cluster").collect().toIndexedSeq.map(_.get(0))
        cv.where(col("cluster").isin(probeIds: _*)).crossJoin(broadcast(query))
      case None =>
        embs.join(index.assignments.withColumnRenamed("id", idCol), idCol)
          .join(broadcast(probed), "cluster")
    }
    candidates
      .select(col(idCol), graft.functions.Rounding.dround(cosine(col(vecCol), col("qvec")), scale).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** One-shot convenience: build (one centroid pass over the mod-k init —
    * enough for probe routing) then probe. For repeated queries use
    * [[buildIvfIndex]] / [[loadIvfIndex]] + the index overload, which is the
    * scale path.
    */
  def ivfTopK(embs: DataFrame, query: DataFrame, k: Int, kClusters: Int = 16,
              nprobe: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding", scale: Int = 6): DataFrame = {
    val (assign, centroids) = ivfIndex(embs, kClusters, iters = 0, idCol, vecCol)
    ivfTopK(IvfIndex(assign, centroids), embs, query, k, nprobe, idCol, vecCol, scale)
  }

  /** ANN top-k via LSH buckets: score only vectors whose bucket key matches
    * the query's (multi-probe = also buckets at hamming distance 1). Returns
    * the same schema as topK; recall < 1 by construction — the ScalaTest
    * suite measures it against the brute-force baseline.
    */
  def annTopK(embs: DataFrame, query: DataFrame, k: Int, nBits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              scale: Int = 6): DataFrame = {
    val keyed = embs.withColumn("bkey", lshKey(col(vecCol), nBits))
    val qKeyed = query.withColumn("qkey", lshKey(col("qvec"), nBits))
    // multi-probe: the query's bucket plus every bucket at hamming distance 1
    val flips = (0 until nBits).map(b => col("qkey").bitwiseXOR(lit(1L << b)))
    val probes = qKeyed.select(col("qvec"),
      explode(array((col("qkey") +: flips): _*)).as("bkey"))
    keyed.join(broadcast(probes), "bkey")
      .select(col(idCol), graft.functions.Rounding.dround(cosine(col(vecCol), col("qvec")), scale).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ---- Product quantization (the IVF-PQ memory story at 100 TB: a PQ
  // code is m bytes per vector, so ADC search touches ~1e-3 of the raw
  // vector bytes and the original embeddings never enter the probe plan)

  /** A built PQ index: `(sub, code, cvec)` codebooks (m × kCodes rows) +
    * `(id, sub, code)` codes — like [[IvfIndex]], an offline artifact
    * built once and probed many times.
    */
  final case class PqIndex(codebooks: DataFrame, codes: DataFrame) {
    def save(path: String): Unit = {
      codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    }
    def unpersist(): Unit = { codebooks.unpersist(); codes.unpersist(); () }
  }

  /** Train per-subspace codebooks and encode the corpus. The vector splits
    * into `m` subvectors of dim/m dims; each subspace runs the SAME
    * deterministic k-means as [[ivfIndex]] (id-mod-k init, 6-dp-rounded
    * means, (distance, code) tie-break) — but all m subspaces train in ONE
    * job family with `sub` in the aggregation key, not m sequential passes.
    * Returns `(codes (id, sub, code), codebooks (sub, code, cvec))`.
    */
  def pqIndex(embs: DataFrame, m: Int, kCodes: Int, iters: Int = 0,
              idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    val v0 = embs.select(col(idCol).as("id"), asD(col(vecCol)).as("v"))
    val dimRow = v0.select(size(col("v"))).limit(1).collect()
    if (dimRow.isEmpty) {
      // empty corpus: a well-typed empty index (probes return zero hits)
      val spark = embs.sparkSession
      import spark.implicits._
      return (Seq.empty[(Long, Int, Int)].toDF("id", "sub", "code"),
        Seq.empty[(Int, Int, Seq[Double])].toDF("sub", "code", "cvec"))
    }
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val d = dim / m
    val sv = v0.select(col("id"),
        posexplode(array((0 until m).map(j =>
          slice(col("v"), j * d + 1, d)): _*)))
      .select(col("id"), col("pos").as("sub"), col("col").as("sv"))
    var assign = sv.select(col("id"), col("sub"),
      pmod(col("id"), lit(kCodes)).cast("int").as("code"))
    var prev: DataFrame = null
    var codebooks: DataFrame = null
    for (it <- 0 to iters) {
      if (it > 0) {
        assign = assign.cache(); assign.count()
        if (prev != null) prev.unpersist()
        prev = assign
      }
      codebooks = sv.join(assign, Seq("id", "sub"))
        .groupBy("sub", "code")
        .agg(graft.functions.native.vecsum(col("sv")).as("s"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"),
          transform(col("s"), x =>
            graft.functions.Rounding.dround(x / col("n"), 6)).as("cvec"))
      val pd = squaredL2(col("sv"), col("cvec"))
      assign = sv.join(broadcast(codebooks), "sub")
        .select(col("id"), col("sub"), col("code"), pd.as("pd"))
        .groupBy("id", "sub")
        .agg(min_by(col("code"), struct(col("pd"), col("code"))).as("code"))
    }
    // Same final-cache handoff as ivfIndex: materialize the RETURNED codes
    // relation, then release the loop's last interim cache — so
    // PqIndex.unpersist() frees everything this build pinned.
    var codesOut = assign.select(col("id"), col("sub"), col("code"))
    if (prev != null) {
      codesOut = codesOut.cache(); codesOut.count(); prev.unpersist()
    }
    (codesOut, codebooks)
  }

  /** ||a − c||² by the expansion a·a − 2a·c + c·c — three in-order native
    * dot products, the composition both engines evaluate identically.
    */
  private def squaredL2(a: Column, c: Column): Column =
    graft.functions.native.dotd(a, a) -
      lit(2.0) * graft.functions.native.dotd(a, c) +
      graft.functions.native.dotd(c, c)

  /** Build and MATERIALIZE the PQ index (cache + count), like
    * [[buildIvfIndex]].
    */
  def buildPqIndex(embs: DataFrame, m: Int, kCodes: Int, iters: Int = 0,
                   idCol: String = "vec_id", vecCol: String = "embedding")
      : PqIndex = {
    val (codes, books) = pqIndex(embs, m, kCodes, iters, idCol, vecCol)
    val c = codes.persist(); val b = books.persist()
    b.count(); c.count()
    PqIndex(b, c)
  }

  def loadPqIndex(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex =
    PqIndex(spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/codes"))

  /** Asymmetric-distance (ADC) top-k through a prebuilt [[PqIndex]]: the
    * query builds an m × kCodes distance table against the codebooks (one
    * broadcast-scalar job shape), and the ONLY corpus-sized input is the
    * codes relation — approximate L2² per doc = Σ table[sub][code], summed
    * as micro-unit BIGINTs (partition-invariant). The raw embeddings are
    * never read: this is the plan that works when the vectors themselves
    * are 100× too big to scan per query. Returns `(idCol, dist)` ascending.
    */
  def pqTopK(index: PqIndex, query: DataFrame, k: Int,
             idCol: String = "vec_id", scale: Int = 6): DataFrame =
    adcRank(index.codes, adcTable(index.codebooks, query), k, idCol, scale)

  /** The query's ADC distance table against a `(sub, code, cvec)` codebook
    * relation: m × kCodes rows of `(sub, code, _pm)` where `_pm` is the
    * micro-unit-rounded subspace L2² — a broadcast-sized artifact computed
    * once per query, shared by [[pqTopK]] and [[ivfPqTopK]].
    */
  private def adcTable(books: DataFrame, query: DataFrame): DataFrame = {
    val meta = books.agg(countDistinct("sub").as("m"),
      first(size(col("cvec"))).as("d")).head()
    if (meta.getLong(0) == 0L) { // empty codebooks (empty corpus): no table
      val spark = books.sparkSession
      import spark.implicits._
      return Seq.empty[(Int, Int, Long)].toDF("sub", "code", "_pm")
    }
    val (m, d) = (meta.getLong(0).toInt, meta.getInt(1))
    val qsv = query.select(
        posexplode(array((0 until m).map(j =>
          slice(asD(col("qvec")), j * d + 1, d)): _*)))
      .select(col("pos").as("sub"), col("col").as("qs"))
    val pdMicros = {
      val t = squaredL2(col("qs"), col("cvec")) * 1e6
      when(t >= 0, floor(t + 0.5)).otherwise(-floor(-t + 0.5)).cast("long")
    }
    qsv.join(books, "sub")
      .select(col("sub"), col("code"), pdMicros.as("_pm"))
  }

  /** ADC ranking over a codes relation: Σ table[sub][code] per doc, summed
    * as micro-unit BIGINTs (partition-invariant), ascending top-k.
    */
  private def adcRank(codes: DataFrame, dt: DataFrame, k: Int,
                      idCol: String, scale: Int): DataFrame =
    codes.join(broadcast(dt), Seq("sub", "code"))
      .groupBy("id")
      .agg(sum("_pm").as("_s"))
      .select(col("id").as(idCol),
        graft.functions.Rounding.dround(col("_s").cast("double") / 1e6, scale)
          .as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  // ---- IVF-PQ composition: the production ANN shape — IVF routes the
  // probe to nprobe clusters, PQ codes are CO-PARTITIONED BY CLUSTER on
  // storage, and ADC runs only over the probed partitions. Each query
  // touches ~(nprobe/kClusters) × (m bytes/vector) — partition-pruned AND
  // raw-vector-free, the two halves of the 100 TB probe story at once.

  /** A built IVF-PQ index: `(cluster, cvec)` coarse centroids for probe
    * routing, `(sub, code, cvec)` PQ codebooks for the ADC table, and the
    * codes relation laid out `partitionBy(cluster)` so the probe's
    * `cluster IN (…)` literal prunes at the scan.
    */
  final case class IvfPqIndex(centroids: DataFrame, codebooks: DataFrame,
                              clusteredCodes: DataFrame) {
    def unpersist(): Unit = { centroids.unpersist(); codebooks.unpersist(); () }
  }

  /** Build the composed index: one IVF pass (coarse routing), one PQ pass
    * (codebooks + codes), then the codes co-partitioned by the vectors'
    * cluster assignment under `path/codes`. PQ here encodes the RAW
    * vectors (not residuals): every piece stays bit-reproducible
    * cross-engine, which is what makes `sim_ivfpq_topk` oracle-checkable.
    */
  def buildIvfPqIndex(embs: DataFrame, kClusters: Int, m: Int, kCodes: Int,
                      path: String, iters: Int = 0, idCol: String = "vec_id",
                      vecCol: String = "embedding"): IvfPqIndex = {
    val spark = embs.sparkSession
    val (assign, cents) = ivfIndex(embs, kClusters, iters, idCol, vecCol)
    val (codes, books) = pqIndex(embs, m, kCodes, iters, idCol, vecCol)
    val c = cents.persist(); val b = books.persist()
    c.count(); b.count()
    graft.core.Layouts.writePartitioned(
      codes.join(assign, "id"), s"$path/codes", "cluster")
    c.write.mode("overwrite").parquet(s"$path/centroids")
    b.write.mode("overwrite").parquet(s"$path/codebooks")
    // The interim assignment and codes relations (cached by ivfIndex/pqIndex
    // when iters >= 1 as their final-cache handoff) exist only to produce
    // the partitioned parquet layout above — release them now, or their
    // corpus-sized blocks stay resident for the session (IvfPqIndex
    // .unpersist only frees centroids and codebooks).
    assign.unpersist(); codes.unpersist()
    IvfPqIndex(c, b, graft.core.Layouts.read(spark, s"$path/codes"))
  }

  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): IvfPqIndex =
    IvfPqIndex(spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/codes"))

  /** ANN top-k through a prebuilt [[IvfPqIndex]]: rank the query against
    * the kClusters coarse centroids (a config-bounded driver collect, like
    * the clustered [[ivfTopK]] path), prune the codes scan to the `nprobe`
    * probed partitions, and ADC-rank only those codes. The raw embedding
    * column appears nowhere in the probe plan.
    */
  def ivfPqTopK(index: IvfPqIndex, query: DataFrame, k: Int, nprobe: Int,
                idCol: String = "vec_id", scale: Int = 6): DataFrame = {
    val probed = query.crossJoin(broadcast(index.centroids))
      .select(col("cluster"),
        (graft.functions.native.dotd(asD(col("qvec")), col("cvec")) /
          (sqrt(graft.functions.native.dotd(col("cvec"), col("cvec"))) + lit(1e-12))).as("sim"))
      .orderBy(col("sim").desc, col("cluster")).limit(nprobe)
    val probeIds = probed.select("cluster").collect().toIndexedSeq.map(_.get(0))
    adcRank(index.clusteredCodes.where(col("cluster").isin(probeIds: _*)),
      adcTable(index.codebooks, query), k, idCol, scale)
  }
}
