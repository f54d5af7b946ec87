package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The normalization kernel behind [[NfcNormalize]], shipped to
  * executors as a codegen reference object (same pattern as
  * [[HyperplaneKernel]]). The fast path matters at 100 TB: almost all
  * real text is already NFC, and `Normalizer.isNormalized` is a scan
  * with no allocation — only the rare denormalized row pays the
  * String round trip.
  */
final class NfcKernel extends Serializable {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `STRING -> STRING` Unicode NFC normalization as a native Catalyst
  * expression. Spark has no built-in for this (the usual fallback is a
  * Scala UDF, which breaks codegen and pays SerDe per row); DuckDB's
  * `nfc_normalize` and ICU-based engines agree on the output, so
  * normalized text is engine-portable — the canonical first step of a
  * training-data text pipeline before any hashing or dedup (NFC-equal
  * texts must hash equal).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  // a non-string argument must fail at analysis with a clear message,
  // not at execution with a ClassCastException (isInstanceOf covers
  // collated string types; NullType keeps graft_nfc(NULL) -> NULL
  // working like every built-in string function)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a STRING argument, got ${child.dataType.sql}")

  @transient private lazy val kernel = new NfcKernel

  override def nullSafeEval(v: Any): Any =
    kernel.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val k = ctx.addReferenceObj("nfcKernel", kernel, classOf[NfcKernel].getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $k.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point. */
  def nfc(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}
