// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Mergeable quantile sketch (KLL-shape compactor ladder) as a
  * single-pass aggregate — the bounded-memory distributed percentile:
  * no global sort, no `Window`, partial buffers of at most ~`capacity`
  * values merge associatively map-side and only the compactor ladder
  * crosses the wire.
  *
  * Level i holds values of weight 2^i. While the total stored count
  * stays within `capacity` everything sits at level 0 with weight 1 and
  * [[eval]] reproduces EXACT `percentile()` semantics bit-for-bit
  * (linear interpolation at rank p·(n-1)) — which is what lets a
  * fixture-sized run pass a DuckDB `quantile_cont` oracle. Past
  * `capacity`, the fullest lowest level sorts and keeps every other
  * element (deterministic alternating parity per level — reproducible
  * across runs, unlike the randomized-coin textbook KLL; the price is
  * adversarial-input guarantees we don't need for telemetry-style
  * percentiles), promoting survivors to the next level.
  *
  * Eval over a saturated sketch treats each stored value as `weight`
  * repeated occurrences and interpolates between adjacent stored values
  * only when the target rank falls in the gap — which degenerates to
  * the exact formula when all weights are 1.
  */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int,
    percentiles: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.Sketch]
    with ExpectsInputTypes {

  require(capacity >= 8, s"sketch capacity must be >= 8, got $capacity")
  require(percentiles.nonEmpty &&
    percentiles.forall(p => p >= 0.0 && p <= 1.0),
    s"percentiles must be within [0, 1], got $percentiles")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_sketch"

  import QuantileSketchAgg.Sketch

  override def createAggregationBuffer(): Sketch = new Sketch(capacity)

  override def update(buf: Sketch, input: InternalRow): Sketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: Sketch, other: Sketch): Sketch = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: Sketch): Any =
    new GenericArrayData(percentiles.map(buf.quantile).toArray)

  override def serialize(buf: Sketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Sketch =
    Sketch.fromBytes(capacity, bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): QuantileSketchAgg = copy(child = cs.head)
}

object QuantileSketchAgg {

  /** Compactor ladder. Not thread-safe (task-confined, like every
    * TypedImperativeAggregate buffer). */
  final class Sketch(val capacity: Int) {
    // levels(i): unsorted values of weight 2^i
    private[QuantileSketchAgg] var levels =
      ArrayBuffer(new ArrayBuffer[Double]())
    // deterministic alternating parity per level (the "coin")
    private[QuantileSketchAgg] var parities = ArrayBuffer(0)
    private[QuantileSketchAgg] var stored = 0

    def add(v: Double): Unit = {
      levels(0) += v
      stored += 1
      if (stored > capacity) { compactOnce(); () }
    }

    def mergeIn(other: Sketch): Unit = {
      while (levels.length < other.levels.length) {
        levels += new ArrayBuffer[Double]()
        parities += 0
      }
      var i = 0
      while (i < other.levels.length) {
        levels(i) ++= other.levels(i)
        stored += other.levels(i).length
        i += 1
      }
      while (stored > capacity && compactOnce()) {}
    }

    /** Sort the fullest level, keep alternate elements, promote.
      * Returns false when nothing is compactable (all levels singleton
      * — stored is then bounded by the level count, ~log of the stream,
      * so accepting the overflow is safe and the caller must stop). */
    private def compactOnce(): Boolean = {
      var li = 0
      var i = 1
      while (i < levels.length) {
        if (levels(i).length > levels(li).length) li = i
        i += 1
      }
      val lvl = levels(li)
      if (lvl.length < 2) return false
      val sorted = lvl.sorted
      if (li + 1 >= levels.length) {
        levels += new ArrayBuffer[Double]()
        parities += 0
      }
      val keepOdd = parities(li) == 1
      parities(li) = 1 - parities(li)
      var j = if (keepOdd) 1 else 0
      val promoted = new ArrayBuffer[Double]((sorted.length + 1) / 2)
      while (j < sorted.length) { promoted += sorted(j); j += 2 }
      stored -= lvl.length
      levels(li) = new ArrayBuffer[Double]()
      levels(li + 1) ++= promoted
      stored += promoted.length
      true
    }

    /** Weighted quantile with gap interpolation; exact `percentile`
      * semantics when everything still has weight 1. */
    def quantile(p: Double): Double = {
      val items = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      if (items.isEmpty) return Double.NaN
      val sorted = items.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val target = p * (total - 1)
      // walk cumulative spans: element j covers ranks [c, c + w)
      var c = 0L
      var j = 0
      while (j < sorted.length) {
        val (v, w) = sorted(j)
        if (target < c + w - 1 + 1e-12) return v // inside the span
        if (j + 1 < sorted.length) {
          val next = sorted(j + 1)._1
          if (target < c + w) {
            // in the unit gap between this span's last rank and the next
            val frac = target - (c + w - 1)
            return v + frac * (next - v)
          }
        }
        c += w
        j += 1
      }
      sorted.last._1
    }

    def toBytes: Array[Byte] = {
      val n = levels.map(_.length).sum
      val bb = ByteBuffer.allocate(4 + levels.length * 8 + n * 8)
      bb.putInt(levels.length)
      levels.indices.foreach { i =>
        bb.putInt(levels(i).length)
        bb.putInt(parities(i))
        levels(i).foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  object Sketch {
    def fromBytes(capacity: Int, bytes: Array[Byte]): Sketch = {
      val bb = ByteBuffer.wrap(bytes)
      val s = new Sketch(capacity)
      val nLevels = bb.getInt
      s.levels = ArrayBuffer.empty
      s.parities = ArrayBuffer.empty
      var stored = 0
      (0 until nLevels).foreach { _ =>
        val n = bb.getInt
        s.parities += bb.getInt
        val lvl = new ArrayBuffer[Double](n)
        (0 until n).foreach(_ => lvl += bb.getDouble)
        stored += n
        s.levels += lvl
      }
      s.stored = stored
      s
    }
  }

  /** Column form: percentile estimates of `x` as array<double>. */
  def quantileSketch(x: Column, capacity: Int,
      percentiles: Seq[Double]): Column =
    ExpressionUtils.column(QuantileSketchAgg(
      ExpressionUtils.expression(x), capacity, percentiles)
      .toAggregateExpression())
}
