package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Size-bounded `collect_list` for hub-capped array aggregates
  * (guide §2.2 skew / §5 memory): collects AT MOST `limit` input
  * values per key and silently ignores the rest, so no aggregation
  * buffer — partial or final — ever holds more than `limit` elements,
  * where `collect_list`/`collect_set` accumulate a hub key's ENTIRE
  * member list before any HAVING can drop it.
  *
  * Contract (what makes the bound safe to use): when the inputs of a
  * key are DISTINCT — true at every graft call site, which all feed a
  * `.distinct()`ed or by-construction-unique stream — the collected
  * size is exactly `min(true count, limit)`, because an element can
  * only be dropped once `limit` elements (necessarily distinct, hence
  * all different from each other) are already held, across update AND
  * merge. So with `limit = cap + 1`, a `size(...) <= cap` HAVING keeps
  * exactly the keys a full collect would keep, with identical (full)
  * contents for every kept key — a hub key's buffer tops out at
  * `cap + 1` elements instead of its full membership. Ordering is not
  * guaranteed (callers sort, as they did with `collect_list`).
  *
  * Implementation mirrors Spark's own `Collect` aggregate (buffer as
  * an in-heap ArrayBuffer under ObjectHashAggregate, spill/shuffle
  * serialization via a single-column UnsafeProjection), with the size
  * gate applied in `update`, `merge` AND `deserialize`.
  */
case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(limit >= 1, s"limit must be >= 1: $limit")

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.size < limit) {
      val v = child.eval(input)
      // nulls ignored, as in collect_list
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.size < limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))
  private lazy val row = new UnsafeRow(1)

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(obj.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buffer = createAggregationBuffer()
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType,
      (_, v) => if (buffer.size < limit) buffer += v)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "bounded_collect_list"
}

object BoundedCollectList {
  /** Column-API entry point: collect at most `limit` values of `c` per
    * group (inputs must be per-key distinct for the exact-size
    * contract — see the class doc).
    */
  def of(c: Column, limit: Int): Column =
    GraftSqlBridge.column(
      BoundedCollectList(GraftSqlBridge.expression(c), limit)
        .toAggregateExpression())
}
