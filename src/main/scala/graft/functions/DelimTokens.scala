package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass delimiter-set splitter behind [[DelimTokens]] (the
  * PorterStemKernel / MinHashMinimaKernel pattern): emits the maximal
  * runs of non-delimiter characters of an (already-lowercased) string,
  * in order, skipping empty runs — BYTE-IDENTICAL to the Catalyst
  * column form `filter(split(s, delimRegex), t => length(t) > 0)` for
  * the two fixed delimiter classes of [[graft.search.Analyzer]]
  * (spec-pinned over the corpus and adversarial inputs), but in one
  * byte scan with no regex engine, no intermediate empty tokens and no
  * higher-order filter pass.
  *
  * Correctness of the byte-level scan: every ASCII delimiter is a
  * single byte that can never occur inside a multi-byte UTF-8 sequence
  * (continuation bytes have the high bit set), and the only multi-byte
  * delimiters (em-dash U+2014 `E2 80 94`, en-dash U+2013 `E2 80 93`)
  * start with the lead byte E2, which likewise cannot occur as a
  * continuation byte — so a 3-byte match is always aligned on a
  * character boundary and splitting byte runs equals splitting
  * character runs.
  */
final class DelimSplitKernel(enDash: Boolean) extends Serializable {
  // ASCII delimiter membership (the em/en-dash are handled separately):
  // the character class of Analyzer.IndexDelimRegex minus the dashes
  private val asciiDelim: Array[Boolean] = {
    val d = new Array[Boolean](128)
    " \t\r\n,.:;'\"()[]{}/<>!?|-#$&=_*+".foreach(c => d(c.toInt) = true)
    d
  }

  def split(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var start = -1
    while (i < n) {
      val b = bytes(i)
      var dlen = 0
      if (b >= 0) { if (asciiDelim(b)) dlen = 1 }
      else if (b == 0xE2.toByte && i + 2 < n && bytes(i + 1) == 0x80.toByte &&
        (bytes(i + 2) == 0x94.toByte || (enDash && bytes(i + 2) == 0x93.toByte)))
        dlen = 3
      if (dlen > 0) {
        if (start >= 0) {
          out.add(UTF8String.fromBytes(bytes, start, i - start)); start = -1
        }
        i += dlen
      } else {
        if (start < 0) start = i
        i += 1
      }
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }
}

/** `STRING -> ARRAY<STRING>` native tokenizer split — the per-row hot
  * loop of every tokenize/shingle/index pipeline
  * ([[graft.search.Analyzer.tokensCol]]): splits on the fixed
  * reference delimiter set and keeps non-empty tokens, replacing a
  * regex `split` (full Java regex engine per row) + higher-order
  * `filter` (a second pass plus a lambda allocation per row) with one
  * byte scan. Output rows are bit-identical to the column form
  * (spec-pinned), so every downstream posting list, shingle set and
  * n-gram statistic is unchanged.
  *
  * @param enDash also treat U+2013 as a delimiter (the word-count
  *               tokenizer's extra character, WordCountDelimRegex)
  */
case class DelimTokens(child: Expression, enDash: Boolean)
    extends UnaryExpression {

  // containsNull = false: matches the column form's type exactly
  // (StringSplit declares non-null elements and ArrayFilter preserves
  // that), so downstream schemas — and the verify dump's parquet
  // schema — are byte-identical
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft delim tokens requires STRING, got ${other.sql}")
    }

  @transient private lazy val kernel = new DelimSplitKernel(enDash)

  override def nullSafeEval(s: Any): Any =
    kernel.split(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val k = ctx.addReferenceObj("delimSplitKernel", kernel,
        classOf[DelimSplitKernel].getName)
      s"${ev.value} = $k.split($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DelimTokens {
  /** Column-API entry point. */
  def of(c: Column, enDash: Boolean): Column =
    GraftSqlBridge.column(DelimTokens(GraftSqlBridge.expression(c), enDash))
}
