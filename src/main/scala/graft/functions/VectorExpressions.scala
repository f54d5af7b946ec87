package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for vector math over `ARRAY<FLOAT>` /
  * `ARRAY<DOUBLE>` columns.
  *
  * The `zip_with`+`aggregate` formulation allocates an intermediate
  * array per row and walks it through interpreted higher-order-function
  * plumbing; at 10^8+ rows (ANN over 100 TB) that allocation is the
  * bottleneck. These expressions generate a tight primitive loop inside
  * whole-stage codegen: no allocation, no virtual calls, accumulation in
  * doubles left-to-right (bit-identical to the column-algebra form they
  * replace).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elementIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"vector expression requires ARRAY<FLOAT|DOUBLE>, got ARRAY<$other>")
    }

  protected def getter(isFloat: Boolean, arr: String, i: String): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Dot product in double precision. Nulls propagate (BinaryExpression
  * default); mismatched lengths stop at the shorter, matching
  * `zip_with` semantics on equal-length inputs (vectors are fixed-dim).
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = elementIsFloat(left); val rf = elementIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // match zip_with: null element -> null sum
      acc += get(a, lf, i) * get(b, rf, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elementIsFloat(left); val rf = elementIsFloat(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (${getter(lf, a, i)}) * (${getter(rf, b, i)});
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity: dot(a,b) / (||a|| * ||b||), all accumulation in
  * doubles, norms as sqrt of left-to-right sums — bit-identical to
  * `aggregate(transform(...))` column algebra and to DuckDB's
  * list_cosine_similarity over DOUBLE[].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = elementIsFloat(left); val rf = elementIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // match zip_with: null element -> null
      val x = get(a, lf, i); val y = get(b, rf, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elementIsFloat(left); val rf = elementIsFloat(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = ${getter(lf, a, i)};
         |  double $y = ${getter(rf, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The multiply-add kernel behind [[HyperplaneSignatures]], shipped to
  * executors as a codegen reference object. The pseudo-random plane
  * matrix depends only on (dimension j, plane id) — NOT on the row — so
  * it is computed once per executor and cached, where the column-algebra
  * formulation re-derives every component with two xxhash64 calls per
  * row x dimension x plane (the dominant cost of banded LSH).
  *
  * Component formula is bit-identical to the column form in
  * [[graft.ops.Similarity.hyperplaneSignature]]:
  * `pmod(xxhash64(j, planeId), 1e6)/1e6 - 0.5` with Spark's two-arg
  * xxhash64 chaining (seed 42), accumulation left-to-right in doubles.
  */
final class HyperplaneKernel(planesPerTable: Int, tables: Int, planeOffset: Int)
    extends Serializable {
  private val nPlanes = planesPerTable * tables

  // plane matrix grown lazily to the observed dimensionality
  @transient @volatile private var planes: Array[Array[Double]] = _

  private def component(j: Int, planeId: Int): Double = {
    val h1 = XXH64.hashInt(j, 42L)
    val h2 = XXH64.hashInt(planeId, h1)
    var m = h2 % 1000000L
    if (m < 0) m += 1000000L
    m / 1000000.0 - 0.5
  }

  private def planeMatrix(dims: Int): Array[Array[Double]] = {
    var p = planes
    if (p == null || p(0).length < dims) synchronized {
      p = planes
      if (p == null || p(0).length < dims) {
        p = Array.tabulate(nPlanes)(pid =>
          Array.tabulate(dims)(j => component(j, pid + planeOffset)))
        planes = p
      }
    }
    p
  }

  def signatures(a: ArrayData, isFloat: Boolean): ArrayData = {
    val dims = a.numElements()
    val mat = planeMatrix(dims)
    val x = new Array[Double](dims)
    var j = 0
    while (j < dims) {
      x(j) = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val row = mat(t * planesPerTable + p)
        var proj = 0.0
        var i = 0
        while (i < dims) { proj += x(i) * row(i); i += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `ARRAY<FLOAT|DOUBLE> -> ARRAY<LONG>`: one bucket signature per LSH
  * table, each of `planesPerTable` sign bits, table t drawing planes
  * `planeOffset + t*planesPerTable ..`. Equivalent to `tables`
  * invocations of the column-algebra signature at increasing offsets
  * (equivalence-tested), with the plane matrix hashed once per executor
  * instead of per row.
  */
case class HyperplaneSignatures(child: Expression, planesPerTable: Int,
                                tables: Int, planeOffset: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"hyperplane signature requires ARRAY<FLOAT|DOUBLE>, got ARRAY<$other>")
    }

  @transient private lazy val kernel =
    new HyperplaneKernel(planesPerTable, tables, planeOffset)

  override def nullSafeEval(v: Any): Any =
    kernel.signatures(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.addReferenceObj("hyperplaneKernel", kernel,
        classOf[HyperplaneKernel].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $k.signatures($a, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-API entry points. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def hyperplaneSignatures(emb: Column, planesPerTable: Int, tables: Int,
                           planeOffset: Int = 0): Column =
    GraftSqlBridge.column(HyperplaneSignatures(GraftSqlBridge.expression(emb),
      planesPerTable, tables, planeOffset))
}
