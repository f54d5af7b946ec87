package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the link-structure side of a
  * corpus pipeline (host/domain authority for crawl prioritization,
  * citation weight for quality scoring). Complements the
  * connected-components machinery in [[Dedup.connectedComponents]]:
  * CC answers "which docs form one duplicate cluster", PageRank ranks
  * nodes by stationary visit probability.
  *
  * Scale posture: one iteration = one join of the (checkpointed,
  * degree-annotated) edge list with the current rank vector on `src`
  * plus one aggregation on `dst` — the classic alternating-shuffle
  * power iteration. The edge list is materialized ONCE
  * (localCheckpoint) and re-read by every round; each round's rank
  * vector is checkpointed so the plan stays flat (no nested join trees
  * after k iterations — the [[Dedup]] large-star/small-star pattern).
  * Nothing corpus-sized ever crosses the driver: the only collected
  * value is the node count (one scalar).
  */
object Graph {

  /** PageRank by power iteration over the UNDIRECTED view of `edges`
    * (each input edge contributes both directions; duplicate edges
    * collapse). Symmetrizing removes dangling nodes by construction —
    * every node has out-degree >= 1, so the rank vector sums to 1.0
    * after every round and no dangling-mass redistribution pass is
    * needed.
    *
    * rank_0(v) = 1/N;
    * rank_{t+1}(v) = (1-d)/N + d * sum over in-neighbors u of
    * rank_t(u) / outdeg(u).
    *
    * @param edges (src, dst) pairs, any orientation, duplicates ok
    * @return (node, rank) — one row per distinct endpoint
    */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // degree-annotated edges: built once, consumed by every iteration
    val linked = und.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    val n = deg.count() // one scalar to the driver — statistics only
    require(n > 0, "pageRank needs a non-empty edge list")
    var ranks = linked.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      ranks = linked.join(ranks, linked("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg((lit((1.0 - damping) / n) +
          lit(damping) * sum(col("rank") / col("outdeg"))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
