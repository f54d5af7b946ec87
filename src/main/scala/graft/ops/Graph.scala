package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the link-structure side of a
  * corpus pipeline (host/domain authority for crawl prioritization,
  * citation weight for quality scoring). Complements the
  * connected-components machinery in [[Dedup]]: CC answers "which docs
  * form one duplicate cluster", PageRank ranks nodes by stationary
  * visit probability.
  *
  * Scale posture: the edge list is folded ONCE into chunked adjacency
  * rows (node-sized table, arrays bounded by `maxFanout` even for
  * web-scale hub nodes) and checkpointed; after that, every power-
  * iteration round shuffles only NODE-sized data — the adjacency ⨝
  * rank join keys on node id and the contribution aggregation
  * map-side-combines the exploded neighbor stream back down to one
  * row per node before it crosses the wire. Edge-sized work per round
  * is purely map-side (the explode). Each round's rank vector is
  * checkpointed so the plan stays flat (the [[Dedup]] large-star/
  * small-star pattern). Nothing corpus-sized ever reaches the driver:
  * the only collected value is the node count (one scalar).
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
    * @param edges     (src, dst) pairs, any orientation, duplicates ok
    * @param maxFanout expected adjacency-chunk size: a node of degree D
    *                  is split into ceil(D / maxFanout) rows by a hash
    *                  of the neighbor, so hub rows stay bounded (the
    *                  split is hash-balanced — sizes are expected, not
    *                  worst-case, bounds)
    * @return (node, rank) — one row per distinct endpoint
    */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85,
               maxFanout: Long = 100000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(maxFanout >= 1, s"maxFanout must be >= 1: $maxFanout")
    // materialize the deduped edge list once: the degree aggregate AND
    // the adjacency fold both consume it, and two lazy consumers would
    // re-run the whole upstream edge derivation (the multiple-consumer
    // re-execution trap)
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = und.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // one-time edge-sized fold into chunked adjacency rows; every
    // iteration re-reads this materialized node-sized table
    val adj = und.join(deg, "src")
      .withColumn("__chunk", pmod(xxhash64(col("dst")),
        greatest(lit(1L), ceil(col("outdeg") / maxFanout.toDouble).cast("long"))))
      .groupBy(col("src"), col("__chunk"))
      .agg(collect_list(col("dst")).as("dsts"), first(col("outdeg")).as("outdeg"))
      .select(col("src"), col("dsts"), col("outdeg"))
      .localCheckpoint()
    val n = deg.count() // one scalar to the driver — statistics only
    require(n > 0, "pageRank needs a non-empty edge list")
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      ranks = adj.join(ranks, adj("src") === ranks("node"))
        .select(explode(col("dsts")).as("node"),
          (col("rank") / col("outdeg")).as("__c"))
        .groupBy("node")
        .agg((lit((1.0 - damping) / n) +
          lit(damping) * sum(col("__c"))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
