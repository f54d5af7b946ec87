package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneSignatures}

/** SparkSessionExtensions hook: registers the engine's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT graft_cosine(a,b)")`
  * works in pure SQL (and via `call_function`). Install with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "graft_cosine"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarity(children(0), children(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(children(0), children(1))))
    // graft_hyperplane_sigs(emb, planesPerTable, tables[, planeOffset]):
    // one LSH bucket signature per table (foldable int literals only)
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hyperplane_sigs"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[HyperplaneSignatures].getName, "graft_hyperplane_sigs"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          // clear analysis-time errors instead of an opaque NPE when a
          // shape argument is a column reference or a non-integer
          def intArg(i: Int, default: => Int): Int =
            if (children.length > i) {
              val c = children(i)
              if (!c.foldable)
                throw new org.apache.spark.sql.AnalysisException(
                  errorClass = "_LEGACY_ERROR_TEMP_3055",
                  messageParameters = Map("detail" ->
                    s"graft_hyperplane_sigs argument ${i + 1} must be an integer literal, got ${c.sql}"))
              c.eval(null) match {
                case n: Number => n.intValue()
                case other =>
                  throw new org.apache.spark.sql.AnalysisException(
                    errorClass = "_LEGACY_ERROR_TEMP_3055",
                    messageParameters = Map("detail" ->
                      s"graft_hyperplane_sigs argument ${i + 1} must be an integer literal, got $other"))
              }
            } else default
          HyperplaneSignatures(children(0), intArg(1, 12), intArg(2, 1), intArg(3, 0))
        }))
  }
}
