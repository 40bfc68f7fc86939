package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge relations — the corpus-curation consumers of
  * the k-NN / near-dup graphs the llm package builds: centrality for
  * sampling weights and hub/boilerplate detection, alongside
  * [[graft.llm.Dedup.connectedComponents]]' cluster resolution.
  */
object Graph {

  /** Rank unit: ranks are integers in 1e-12 of the total mass. */
  val RankUnit: Long = 1000000000000L

  /** PageRank with EXACT integer arithmetic — every division is integer
    * `DIV` and every sum is over longs, so ranks are bit-identical in any
    * engine at any parallelism (pinned semantics instead of float
    * convergence): `r0 = UNIT DIV n`; each round
    * `r' = (15·UNIT) DIV (100·n) + (85·Σ_in(r DIV outdeg)) DIV 100`.
    * Truncation remainders and dangling-node mass simply drain — fine for
    * a RANKING, where relative order is what consumers use.
    *
    * Shape at scale: the edge relation is cached once and each round is
    * ONE keyed join + keyed aggregate (the same diameter-bounded loop
    * discipline as connectedComponents, but a fixed iteration count); the
    * rank relation is two longs per node. The edge/node relations are
    * EAGERLY localCheckpointed up front (not merely cached): a cache
    * keeps the upstream logical plan — every round would re-optimize the
    * whole edge-construction DAG (e.g. the k-NN build) — while the flat
    * LogicalRDD leaf makes each round's plan constant-size (measured
    * ~25% of query time in pure driver planning on the knn gate without
    * this). Per-round lazy checkpoints bound the iteration lineage the
    * same way. The only driver values are the node count and the
    * constants derived from it.
    */
  def pagerank(edges: DataFrame, iters: Int = 3,
               srcCol: String = "src", dstCol: String = "dst",
               checkpointEvery: Int = 1): DataFrame = {
    require(iters >= 1 && checkpointEvery >= 1)
    val ed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = ed.select(col("src").as("id"))
      .unionAll(ed.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val deg = ed.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = 15L * RankUnit / (100L * n)
    var r = nodes.select(col("id"), lit(RankUnit / n).as("r"))
    var it = 0
    while (it < iters) {
      val contrib = ed
        .join(r.select(col("id").as("src"), col("r")), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("r DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      r = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(c, 0L)) DIV 100")).as("r"))
      it += 1
      if (it % checkpointEvery == 0 && it < iters) r = r.localCheckpoint(false)
    }
    r.localCheckpoint()
  }
}
