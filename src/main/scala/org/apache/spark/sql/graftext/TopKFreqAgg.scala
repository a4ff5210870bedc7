// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters (frequent-items) sketch as a single-pass aggregate —
  * the Space-Saving algorithm (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT 2005).
  *
  * The buffer holds at most `capacity` (term, count) entries per group.
  * While the map has room, counting is exact. When a NEW term arrives
  * into a full map, the minimum-count entry is evicted and the new term
  * inherits `min + 1` (the classic over-estimate bound: true count ≤
  * reported count ≤ true count + min). When `capacity >= ` the group's
  * distinct cardinality the result is EXACTLY the top-n by count — that
  * exact regime is what the DuckDB oracle checks; the bounded regime is
  * what survives a 100 TB skewed stream (SketchesSpec covers both).
  *
  * Scale design: partial aggregation keeps the bounded map on the map
  * side, so at most `capacity` entries per group cross the shuffle
  * regardless of input rows — the same reason [[KmvSketchAgg]] exists.
  * Output: the top `topN` entries as `array<struct<term,cnt>>`, sorted
  * (cnt DESC, term ASC) so results are deterministic under ties.
  */
case class TopKFreqAgg(
    child: Expression,
    capacity: Int,
    topN: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with ExpectsInputTypes {

  require(capacity >= 1, s"topk_freq needs capacity >= 1, got $capacity")
  require(topN >= 1 && topN <= capacity,
    s"topk_freq needs 1 <= topN <= capacity, got topN=$topN capacity=$capacity")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_freq"

  type Buf = java.util.HashMap[String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  private def bump(buf: Buf, term: String, by: Long): Unit = {
    val cur = buf.get(term)
    if (cur != null) { buf.put(term, cur + by); () }
    else if (buf.size < capacity) { buf.put(term, by); () }
    else {
      // evict the min-count entry (term-asc tiebreak keeps eviction,
      // and therefore the whole aggregate, deterministic)
      var minK: String = null
      var minV = Long.MaxValue
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue < minV || (e.getValue == minV &&
            (minK == null || e.getKey.compareTo(minK) < 0))) {
          minV = e.getValue; minK = e.getKey
        }
      }
      buf.remove(minK)
      buf.put(term, minV + by)
      ()
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // deterministic merge order (term-asc) so partial-aggregation
    // topology cannot change the result
    val keys = new java.util.ArrayList[String](other.keySet())
    java.util.Collections.sort(keys)
    keys.forEach(k => bump(buf, k, other.get(k)))
    buf
  }

  override def eval(buf: Buf): Any = {
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, java.lang.Long]](
      buf.entrySet())
    entries.sort((a, b) => {
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    })
    val n = math.min(topN, entries.size)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      rows(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.longValue))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val enc = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    buf.forEach { (k, v) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      enc.add((b, v.longValue)); bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(enc.size)
    enc.forEach { case (b, v) => bb.putInt(b.length); bb.put(b); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n  = bb.getInt
    val m  = new Buf()
    var i  = 0
    while (i < n) {
      val len = bb.getInt
      val b   = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKFreqAgg = copy(child = cs.head)
}

object TopKFreqAgg {
  /** Column form: top-`topN` most frequent values of `term` with a
    * `capacity`-bounded Space-Saving buffer. */
  def topKFreq(term: Column, capacity: Int, topN: Int): Column =
    ExpressionUtils.column(
      TopKFreqAgg(ExpressionUtils.expression(term), capacity, topN)
        .toAggregateExpression())
}
