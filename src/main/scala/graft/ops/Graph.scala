package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the link-structure side of a
  * corpus pipeline (host/domain authority for crawl prioritization,
  * citation weight for quality scoring, community detection for topic
  * bucketing). Complements the connected-components machinery in
  * [[Dedup]]: CC answers "which docs form one duplicate cluster",
  * PageRank ranks nodes by stationary visit probability, label
  * propagation groups nodes into densely-linked communities.
  *
  * Scale posture (shared by both algorithms): the edge list is folded
  * ONCE into chunked adjacency rows (node-sized table, arrays bounded
  * by `maxFanout` even for web-scale hub nodes) and checkpointed;
  * after that, every iteration round shuffles only NODE-sized data —
  * the adjacency ⨝ state join keys on node id and the per-round
  * aggregation map-side-combines the exploded neighbor stream back
  * down before it crosses the wire. Edge-sized work per round is
  * purely map-side (the explode). Each round's state vector is
  * checkpointed so the plan stays flat (the [[Dedup]] large-star/
  * small-star pattern). Nothing corpus-sized ever reaches the driver:
  * the only collected value is the node count (one scalar).
  */
object Graph {

  /** One-time fold of `edges` into the UNDIRECTED chunked adjacency
    * table `(src, dsts, outdeg)` (localCheckpointed) — each input edge
    * contributes both directions, duplicates collapse, and a node of
    * degree D is split into ceil(D / maxFanout) rows by a hash of the
    * neighbor (hash-balanced: sizes are expected, not worst-case,
    * bounds). Symmetrizing removes dangling nodes by construction —
    * every node has out-degree >= 1.
    *
    * The deduped edge list is materialized once: the degree aggregate
    * AND the adjacency fold both consume it, and two lazy consumers
    * would re-run the whole upstream edge derivation (the
    * multiple-consumer re-execution trap).
    */
  private def chunkedAdjacency(edges: DataFrame,
                               maxFanout: Long): DataFrame = {
    require(maxFanout >= 1, s"maxFanout must be >= 1: $maxFanout")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = und.groupBy("src").agg(count(lit(1)).as("outdeg"))
    und.join(deg, "src")
      .withColumn("__chunk", pmod(xxhash64(col("dst")),
        greatest(lit(1L), ceil(col("outdeg") / maxFanout.toDouble).cast("long"))))
      .groupBy(col("src"), col("__chunk"))
      .agg(collect_list(col("dst")).as("dsts"), first(col("outdeg")).as("outdeg"))
      .select(col("src"), col("dsts"), col("outdeg"))
      .localCheckpoint()
  }

  /** PageRank by power iteration over the undirected view of `edges`.
    * Every node has out-degree >= 1 (symmetrized), so the rank vector
    * sums to 1.0 after every round and no dangling-mass redistribution
    * pass is needed.
    *
    * rank_0(v) = 1/N;
    * rank_{t+1}(v) = (1-d)/N + d * sum over in-neighbors u of
    * rank_t(u) / outdeg(u).
    *
    * @param edges     (src, dst) pairs, any orientation, duplicates ok
    * @param maxFanout expected adjacency-chunk size bound
    * @return (node, rank) — one row per distinct endpoint
    */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85,
               maxFanout: Long = 100000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val adj = chunkedAdjacency(edges, maxFanout)
    val n = adj.select(countDistinct("src")).collect()(0).getLong(0)
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

  /** Synchronous label propagation (community detection): every node
    * starts labeled with its own id; each round it adopts the most
    * frequent label among its NEIGHBORS (self excluded), most-frequent
    * ties broken by the smallest label — fully deterministic, so runs
    * are reproducible and oracle-checkable (classic async LPA is
    * order-dependent by design; this is the synchronous variant).
    *
    * Per-round shuffle shape: the exploded (node, neighbor-label)
    * stream partial-aggregates map-side into (node, label) counts;
    * the per-node argmax is TWO bounded windows — top-1 per
    * (node, label-hash-bucket), then top-1 over the <= `buckets`
    * survivors — so a web-scale hub never funnels its full distinct-
    * label set through one window partition unsplit.
    *
    * @return (node, label) after `iterations` rounds
    */
  def labelPropagation(edges: DataFrame, iterations: Int,
                       maxFanout: Long = 100000L,
                       buckets: Int = 64): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val adj = chunkedAdjacency(edges, maxFanout)
    var labels = adj.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val perBucket = Window.partitionBy("node", "__b")
      .orderBy(desc("__cnt"), asc("label"))
    val overall = Window.partitionBy("node")
      .orderBy(desc("__cnt"), asc("label"))
    for (_ <- 1 to iterations) {
      labels = adj.join(labels, adj("src") === labels("node"))
        .select(explode(col("dsts")).as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("__cnt"))
        .withColumn("__b", pmod(xxhash64(col("label")), lit(buckets)))
        .withColumn("__rb", row_number().over(perBucket))
        .filter(col("__rb") === 1)
        .withColumn("__r", row_number().over(overall))
        .filter(col("__r") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
    }
    labels
  }
}
