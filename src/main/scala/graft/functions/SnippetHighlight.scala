package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The snippet-render kernel behind [[SnippetHighlight]]: extract the
  * reference's interval-coalesced snippet around the highlight words'
  * up-to-3rd occurrences, then wrap each highlight (and its
  * Capitalized form) in the yellow span — the composition of
  * `SearchEngine.snippetOf` and `highlightWrap`
  * (`util/CorpusFetcher.java:120-194`). NULL highlight elements are
  * FILTERED (defined, not assumed away): the query path passes a
  * parsed-word literal array, but `graft_snippet` is on the public
  * SQL surface where a user array can carry null slots — an unguarded
  * `getUTF8String` would NPE at runtime.
  */
final class SnippetHighlightKernel extends Serializable {
  def render(content: UTF8String, highlights: ArrayData): UTF8String = {
    val hl: Seq[String] = (0 until highlights.numElements())
      .filter(i => !highlights.isNullAt(i))
      .map(i => highlights.getUTF8String(i).toString)
    UTF8String.fromString(
      graft.search.SearchEngine.highlightWrap(
        graft.search.SearchEngine.snippetOf(content.toString, hl), hl))
  }
}

/** `(STRING content, ARRAY<STRING> highlights) -> STRING` snippet
  * extraction + highlight wrapping as a native Catalyst expression.
  * Runs on ONE RESULT PAGE per query (≤ PageSize rows after the
  * TakeOrdered cut), so this is presentation cost either way — but as
  * a native expression the page-render projection stays inside
  * whole-stage codegen, which lets the suite-wide plan audit assert
  * ZERO ScalaUDFs across every query path (the last allowlisted
  * non-fixture UDFs were exactly these renders).
  */
case class SnippetHighlight(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_snippet requires (STRING, ARRAY<STRING>) arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  @transient private lazy val kernel = new SnippetHighlightKernel

  override def nullSafeEval(c: Any, h: Any): Any =
    kernel.render(c.asInstanceOf[UTF8String], h.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, h) => {
      val k = ctx.addReferenceObj("snippetKernel", kernel,
        classOf[SnippetHighlightKernel].getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $k.render($c, $h);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SnippetHighlight {
  /** Column-API entry point. */
  def of(content: Column, highlights: Column): Column =
    GraftSqlBridge.column(SnippetHighlight(
      GraftSqlBridge.expression(content), GraftSqlBridge.expression(highlights)))
}
