package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking functions over the posting statistics. The reference ships
  * only its TF-IDF variant (mixed log bases, `code/inverted/
  * InvertedIndexMapred.java:215-221`, kept in [[Indexer.postings]]);
  * BM25 (Robertson et al.) is the standard alternative a modern engine
  * offers — same inputs (tf, df, docNum) plus document length.
  */
object Scoring {

  val K1 = 1.2
  val B = 0.75

  /** Lucene-style BM25 idf: `ln(1 + (N - df + 0.5) / (df + 0.5))`. */
  def bm25Idf(docNum: Column, df: Column): Column =
    log(lit(1.0) + (docNum - df + 0.5) / (df + 0.5))

  /** BM25 term score given term frequency, document length, and the
    * corpus average document length.
    */
  def bm25Term(tf: Column, dl: Column, avgdl: Column,
               docNum: Column, df: Column): Column =
    bm25Idf(docNum, df) * (tf * (K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0) - B + lit(B) * dl / avgdl))

  /** BM25-scored posting table
    * `(term, doc_id, tf, positions, df, dl, score)` from a documents
    * table — the same DAG as [[Indexer.postings]] plus one per-doc
    * length aggregate (`dl = sum(tf)`, i.e. total kept tokens) and the
    * 1-row avgdl broadcast. Carries positions, so it drops into
    * [[QueryCompiler]] as an alternative scorer for the full boolean
    * algebra (including phrase proximity).
    */
  def bm25Postings(docs: DataFrame, stopWords: Seq[String] = Seq.empty,
                   stem: Boolean = true): DataFrame = {
    val stats = Indexer.termDocStats(docs, stopWords, stem)
    val dl = stats.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfPerTerm = stats.groupBy("term").agg(count("*").as("df"))
    val globals = dl.agg(avg("dl").as("avgdl"),
      count("*").as("doc_num"))
    // dl is one row per document — large at scale, so a plain shuffle
    // join on doc_id (AQE decides); only the 1-row globals broadcast
    stats.join(dfPerTerm, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(globals))
      .select(col("term"), col("doc_id"), col("tf"), col("positions"),
        col("df"), col("dl"),
        bm25Term(col("tf"), col("dl"), col("avgdl"),
          col("doc_num"), col("df")).as("score"))
  }

  /** "More like this": top-k documents ranked by TF-IDF cosine against
    * one document's term-weight vector — related-document retrieval
    * over the same posting table the boolean engine uses, no embedding
    * model required. The query vector is ONE document's postings (tiny
    * → broadcast); the corpus side pays one semi-joined scan of the
    * posting table for the dot products plus one per-doc norm
    * aggregate. Sparse algebra throughout — the (term, doc) posting
    * relation IS the sparse matrix, no dense vectors ever materialize,
    * so a hot term never concentrates on one executor beyond its
    * posting rows.
    */
  def moreLikeThis(postings: DataFrame, docId: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = postings.filter(col("doc_id") === docId)
      .select(col("term"), col("score").as("qw"))
    val qNorm = q.agg(sqrt(sum(col("qw") * col("qw"))).as("qnorm"))
    val norms = postings.groupBy("doc_id")
      .agg(sqrt(sum(col("score") * col("score"))).as("nrm"))
    postings.filter(col("doc_id") =!= docId)
      .join(broadcast(q), "term")
      .groupBy("doc_id").agg(sum(col("score") * col("qw")).as("dot"))
      // dot > 0 also guards the division: an all-zero-score doc (every
      // term in every document -> idf 0) has nrm = 0, and 0/0 = NaN
      // would sort ABOVE every real cosine in a descending order
      .filter(col("dot") > 0)
      .join(norms, "doc_id")
      .crossJoin(broadcast(qNorm))
      .select(col("doc_id"),
        (col("dot") / (col("nrm") * col("qnorm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(k)
  }
}
