// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Variable-byte (VByte) posting-block encoder as a typed aggregate:
  * collects the group's doc ids (a posting BLOCK — the caller groups by
  * `(term, doc_id div blockWidth)`, so the buffer is bounded by block
  * occupancy, never corpus-sized), sorts, and emits the classic
  * compressed layout — first id absolute, then gaps, each as 7-bit
  * groups with a continuation bit (the Lucene/ES postings format
  * family). Input order is irrelevant (the buffer sorts), so the
  * encoding is deterministic under any partitioning.
  *
  * Why an aggregate and not a UDF: the encode runs INSIDE partial
  * aggregation — map-side combine ships one bounded byte buffer per
  * group per partition, and the whole index-compression pass stays a
  * single shuffle of compressed blocks (≈1–2 bytes per posting on the
  * wire instead of 8). */
case class VBytePostingsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vbyte_postings"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other); buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val ids = new Array[Long](buf.size)
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { ids(i) = it.next(); i += 1 }
    graft.index.Postings.encodeSorted(ids)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n  = bb.getInt
    val s  = new java.util.TreeSet[java.lang.Long]()
    var i  = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): VBytePostingsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VBytePostingsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VBytePostingsAgg = copy(child = cs.head)
}

object VBytePostingsAgg {
  /** Column form: VByte-encoded block of the group's `id` values. */
  def vbyteBlock(id: Column): Column =
    ExpressionUtils.column(
      VBytePostingsAgg(ExpressionUtils.expression(id)).toAggregateExpression())
}
