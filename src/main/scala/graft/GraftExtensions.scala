package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneSignatures, NfcNormalize}

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
        (children: Seq[Expression]) =>
          CosineSimilarity(children(0), children(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) =>
          DotProduct(children(0), children(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NfcNormalize].getName, "graft_nfc"),
        GraftExtensions.nfcBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_stem"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.PorterStem].getName, "graft_stem"),
        GraftExtensions.stemBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_min_token_distance"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.MinTokenDistance].getName,
          "graft_min_token_distance"),
        GraftExtensions.minTokenDistanceBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_snippet"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.SnippetHighlight].getName, "graft_snippet"),
        GraftExtensions.snippetBuilder))
    // NFC is idempotent: nested graft_nfc collapses to one pass
    ext.injectOptimizerRule(_ => graft.plans.NfcIdempotence)
    // graft_hyperplane_sigs(emb, planesPerTable, tables[, planeOffset]):
    // one LSH bucket signature per table (foldable int literals only)
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hyperplane_sigs"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[HyperplaneSignatures].getName, "graft_hyperplane_sigs"),
        GraftExtensions.hyperplaneSigsBuilder))
  }
}

object GraftExtensions {
  /** Register the same functions + optimizer rule on an ALREADY-BUILT
    * session: `withExtensions` only works at builder time, but a host
    * application (or the driver's Verify/Bench harness) hands us a
    * live session. Uses the session's own function registry and
    * `experimental.extraOptimizations` — both public, both
    * session-scoped — and is idempotent (re-install replaces the
    * functions and adds the rule at most once).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nfc", nfcBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_stem", stemBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_sigs",
      hyperplaneSigsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_min_token_distance",
      minTokenDistanceBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_snippet", snippetBuilder, "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.NfcIdempotence))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NfcIdempotence
  }

  /** Builder for `graft_nfc`, exposed for registry-path tests. Wrong
    * arity fails analysis with a clear message (the default
    * `children.head` would silently drop extra arguments).
    */
  val nfcBuilder: Seq[Expression] => Expression = {
    case Seq(child) => NfcNormalize(child)
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" ->
        s"graft_nfc takes exactly 1 argument, got ${other.length}"))
  }

  /** Builder for `graft_stem` (same arity contract as [[nfcBuilder]]). */
  val stemBuilder: Seq[Expression] => Expression = {
    case Seq(child) => graft.functions.PorterStem(child)
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" ->
        s"graft_stem takes exactly 1 argument, got ${other.length}"))
  }

  /** Builder for `graft_min_token_distance` (arity 2). */
  val minTokenDistanceBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => graft.functions.MinTokenDistance(a, b)
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" ->
        s"graft_min_token_distance takes exactly 2 arguments, got ${other.length}"))
  }

  /** Builder for `graft_snippet` (arity 2: content, highlight array). */
  val snippetBuilder: Seq[Expression] => Expression = {
    case Seq(c, h) => graft.functions.SnippetHighlight(c, h)
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" ->
        s"graft_snippet takes exactly 2 arguments, got ${other.length}"))
  }

  /** The exact builder injected for `graft_hyperplane_sigs`, exposed so
    * tests can drive its error path directly. Raises a clear
    * analysis-time error instead of an opaque NPE when a shape argument
    * is a column reference or a non-integer.
    */
  val hyperplaneSigsBuilder: Seq[Expression] => Expression = { children =>
    def intArg(i: Int, default: => Int): Int =
      if (children.length > i) {
        val c = children(i)
        // USER_RAISED_EXCEPTION is a passthrough template
        // ("<errorMessage>") present in Spark 4.1.2's
        // error-conditions.json; _LEGACY_ERROR_TEMP_3055 is not.
        def bad(got: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              s"graft_hyperplane_sigs argument ${i + 1} must be an integer literal, got $got"))
        if (!c.foldable) bad(c.sql)
        c.eval(null) match {
          case n: Number => n.intValue()
          case other => bad(String.valueOf(other))
        }
      } else default
    HyperplaneSignatures(children(0), intArg(1, 12), intArg(2, 1), intArg(3, 0))
  }
}
