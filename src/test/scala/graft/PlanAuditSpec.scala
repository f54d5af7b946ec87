package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide plan regression gate: NO `SparkEntry.queries` entry may
  * plan a CartesianProduct or BroadcastNestedLoopJoin, except the
  * entries that are cartesian BY CONTRACT (labeled all-pairs baselines
  * and the intentional cross-join demo). A future edit that silently
  * turns an equi-join into a nested-loop — a dropped join key, a
  * non-equi predicate, a missed broadcast — fails here, at plan time,
  * before it ever becomes a scale incident.
  *
  * Plans are built (analysis + optimization + physical planning) but
  * never executed; entries that eagerly materialize session caches
  * while CONSTRUCTING their DataFrame do run those small jobs at
  * sf0.001 — that is the same work Verify does, just tiny.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Cartesian by documented contract, not by accident. */
  private val cartesianByContract = Set(
    "q_cross_join", // the cross-join operator demo itself
    "dedup_embedding_exact", // labeled all-pairs oracle baseline (scale-gated out of bench)
    "dedup_embedding_strict" // brute-force-equal banded path verifies vs planted twins
  )

  // a handful of entries broadcast 1-row frames (corpus stats, a query
  // vector) via crossJoin — constant-sized, explicitly designed; their
  // plans contain BroadcastNestedLoopJoin over ONE build row, which is
  // a broadcast of a scalar, not a scale risk
  private val scalarBroadcastOk = Set(
    "tfidf_postings", "bm25_postings", "search_bm25", "doc_keywords",
    "search_more_like_this", "search_hybrid_rrf", "postings_incremental",
    "postings_stemmed", "search_cnf", "search_phrase", "search_and",
    "search_or", "search_and_not", "search_not_or", "search_page1",
    "search_snippets", "search_stopword_drop", "search_batch",
    "dedup_keep_best", "text_dsir", "text_quality_classifier",
    "index_stats", // 1-row doc-count frame crossed into the stats row
    "q_exact_quantile", // 1-row total-count frame drives bucket targets
    "q_profile", // 1-row distinct-count branches crossed back together
    "q_quality_audit", // 1-row audit metrics crossed into check rows
    "search_hybrid", // one query vector + 1-row corpus stats
    "sim_cluster_assign", // broadcast centroid table (model-sized)
    "sim_topk_brute", // one query vector crossed into the scan
    "text_collocations", // 1-row corpus token total for PMI
    "text_stupid_backoff", // 1-row corpus total for backoff normalization
    "q_hist_quantile_incremental") // 1-row histogram total drives the rank

  test("no query plans an accidental cartesian / nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if cartesianByContract.contains(name) => None
      case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLANNING FAILED: $e" }
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !scalarBroadcastOk.contains(name)
        if (plan.startsWith("PLANNING FAILED") || cartesian || bnlj)
          Some(name -> (if (cartesian) "CartesianProduct"
            else if (bnlj) "BroadcastNestedLoopJoin" else plan))
        else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, why) => s"$n: $why" }.mkString("\n"))
  }
}
