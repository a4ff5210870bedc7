// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}

/** KMV (k-minimum-values) distinct-count sketch as a single-pass
  * aggregate: the buffer is the set of the k smallest DISTINCT 60-bit
  * md5 hashes of the input strings; the estimate is
  * `(k-1) * 2^60 / h_k` (exact count when fewer than k distinct values
  * were seen).
  *
  * This is the production form the DF-algebra shape in
  * [[graft.functions.Sketches]] demonstrates: no distinct shuffle, no
  * windows — partial aggregation keeps a bounded k-element buffer per
  * group on the map side, and only k longs per group cross the wire.
  * Hashing is md5-derived (`substr(md5(x),1,15)` parsed base-16), so the
  * estimate is bit-identical to the DF-algebra form and to the DuckDB
  * oracle — unlike `approx_count_distinct`'s engine-specific HLL.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  private val hashSpace: Double = math.pow(2.0, 60)
  private val hexChars = "0123456789abcdef".getBytes

  /** First 15 hex chars of md5(s) as a long — identical to
    * `conv(substring(md5(c),1,15),16,10)` (TextFunctions.md5Long): the
    * big-endian first 8 digest bytes hold the first 16 hex chars, and
    * `>>> 4` drops the 16th. */
  private def md5Long60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  // one digest per task, not per row (thread-confined within a task)
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = md5Long60(md,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast(); () }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
      else continue = false // other is sorted: the rest can't qualify
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * hashSpace / buf.last().toDouble

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

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KmvSketchAgg = copy(child = cs.head)
}

object KmvSketchAgg {
  /** Column form: KMV distinct-count estimate of `key` (stringified by
    * the caller) with sketch size k. */
  def kmvDistinct(key: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(key), k).toAggregateExpression())
}
