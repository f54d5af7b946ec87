package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The one-pass min-hash kernel behind [[MinHashMinima]] (the
  * PorterStemKernel / MinTokenDistanceKernel pattern). For pre-hashed
  * shingle keys `hs` it computes, for every hash function
  * `i in [0, numHashes)`, `min over h in hs of xxhash64(h, i)` —
  * BYTE-IDENTICAL to the Catalyst column form
  * `array_min(transform(hs, h => xxhash64(h, i)))` (Spark's multi-arg
  * xxhash64 with an INT literal second argument folds to
  * `hashInt(i, hashLong(h, 42))`; pinned by spec against the column
  * form), but in ONE traversal of the array with zero intermediate
  * allocations, where the column form allocates `numHashes`
  * transformed arrays per row and re-derives `hashLong(h, 42)` for
  * each of them.
  */
final class MinHashMinimaKernel extends Serializable {
  /** Per-function minima; null slots where the input array is empty
    * (mirrors `array_min(empty) = NULL` of the column form). NULL
    * ELEMENTS in `hs` are skipped the same way the column form's
    * `transform` + `array_min` skip them (xxhash64 of a null column
    * leaves the seed unchanged — but the pre-hashed key array is
    * built from non-null shingles, so this is defensive only).
    */
  def minima(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    var anyNonNull = false
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var e = 0
    while (e < n) {
      if (!hs.isNullAt(e)) {
        anyNonNull = true
        val g = XXH64.hashLong(hs.getLong(e), 42L)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashInt(i, g)
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      e += 1
    }
    if (!anyNonNull) new GenericArrayData(new Array[Any](numHashes))
    else new GenericArrayData(out)
  }
}

/** `ARRAY<BIGINT> -> ARRAY<BIGINT>` per-hash-function min-hash minima
  * as a native Catalyst expression — the per-row hot loop of the LSH
  * banding ([[graft.ops.Dedup]] minHashLshVerified / bandedBuckets):
  * every representative document evaluates this once over its hashed
  * shingle-key array. The equivalent higher-order-function form
  * (`transform(sequence(...), i => array_min(transform(hs, ...)))`)
  * is whole-stage-codegen'd too, but allocates one transformed array
  * per hash function per row and walks the input `numHashes` times;
  * this walks it once. Output values are bit-identical to the column
  * form (spec-pinned), so LSH bucket contents — and therefore the
  * verified pair list — are unchanged.
  */
case class MinHashMinima(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft minhash minima requires ARRAY<BIGINT>, got ${other.sql}")
    }

  @transient private lazy val kernel = new MinHashMinimaKernel

  override def nullSafeEval(hs: Any): Any =
    kernel.minima(hs.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val k = ctx.addReferenceObj("minhashKernel", kernel,
        classOf[MinHashMinimaKernel].getName)
      s"${ev.value} = $k.minima($hs, $numHashes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashMinima {
  /** Column-API entry point. */
  def of(hs: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashMinima(GraftSqlBridge.expression(hs), numHashes))
}
