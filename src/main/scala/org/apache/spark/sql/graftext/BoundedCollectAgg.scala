// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Aggregation buffer: insertion-ordered values plus (for set semantics)
  * a dedup index. Per-buffer state — hash aggregation interleaves updates
  * across many live groups, so dedup state cannot live on the expression.
  */
final class BoundedCollectBuf(distinct: Boolean) {
  val values = mutable.ArrayBuffer.empty[Any]
  private val seen = if (distinct) mutable.HashSet.empty[Any] else null

  /** No-op once the buffer holds `maxSize + 1` (distinct) elements — the
    * overflow marker. Memory stays bounded no matter how hot the key. */
  def add(v: Any, maxSize: Int): Unit =
    if (values.length <= maxSize && (seen == null || seen.add(v))) {
      values += v; ()
    }
}

/** `collect_set`/`collect_list` with a hard per-group memory bound — the
  * hot-key guard for LSH pair generation (graft.dedup.Dedup): a group that
  * exceeds `maxSize` elements evaluates to NULL (callers drop it), and its
  * buffer NEVER grows past `maxSize + 1` elements, so one degenerate band /
  * stop-shingle / dead bucket cannot OOM an executor or explode into
  * O(n^2) pairs. Standard LSH practice: an over-shared key carries no
  * similarity signal, only quadratic cost.
  *
  * `distinct = true` gives set semantics — requires element types with
  * value equality (primitives / strings), which is what the callers
  * collect (doc ids). Struct elements use `distinct = false`.
  *
  * Overflow survives partial aggregation without extra state: each partial
  * buffer stops growing at `maxSize + 1`, and a merged buffer that still
  * holds more than `maxSize` (distinct) elements is overflowing by
  * definition — for sets the partials' kept elements may differ, but any
  * partial holding `maxSize + 1` distinct elements forces the merged
  * distinct count past the cap regardless of which elements it kept.
  */
case class BoundedCollectAgg(
    child: Expression,
    maxSize: Int,
    distinct: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedCollectBuf] {

  require(maxSize >= 1, s"bounded_collect needs maxSize >= 1, got $maxSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String =
    if (distinct) "bounded_collect_set" else "bounded_collect_list"

  override def createAggregationBuffer(): BoundedCollectBuf =
    new BoundedCollectBuf(distinct)

  override def update(buf: BoundedCollectBuf, input: InternalRow)
      : BoundedCollectBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(InternalRow.copyValue(v), maxSize)
    buf
  }

  override def merge(buf: BoundedCollectBuf, other: BoundedCollectBuf)
      : BoundedCollectBuf = {
    other.values.foreach(v => buf.add(v, maxSize))
    buf
  }

  override def eval(buf: BoundedCollectBuf): Any =
    if (buf.values.length > maxSize) null
    else new GenericArrayData(buf.values.toArray)

  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType)))

  override def serialize(buf: BoundedCollectBuf): Array[Byte] =
    proj(InternalRow(new GenericArrayData(buf.values.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val out = new BoundedCollectBuf(distinct)
    var i = 0
    while (i < arr.numElements()) {
      // maxSize + 1 (not maxSize) so the overflow marker survives the
      // round-trip
      out.add(InternalRow.copyValue(arr.get(i, child.dataType)), maxSize)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BoundedCollectAgg = copy(child = cs.head)
}

object BoundedCollectAgg {
  /** Set-semantics bounded collect: NULL for groups with more than
    * `maxSize` distinct values. Element type needs value equality. */
  def boundedCollectSet(c: Column, maxSize: Int): Column =
    ExpressionUtils.column(BoundedCollectAgg(
      ExpressionUtils.expression(c), maxSize, distinct = true)
      .toAggregateExpression())

  /** List-semantics bounded collect: NULL for groups with more than
    * `maxSize` rows. */
  def boundedCollectList(c: Column, maxSize: Int): Column =
    ExpressionUtils.column(BoundedCollectAgg(
      ExpressionUtils.expression(c), maxSize, distinct = false)
      .toAggregateExpression())
}
