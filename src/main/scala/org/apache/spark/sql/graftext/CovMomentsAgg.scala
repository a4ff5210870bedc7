// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType}

/** One-pass EXACT second-moment accumulation over a vector column —
  * the distributed building block for a covariance matrix / PCA over
  * embeddings. Inputs are pre-rounded to 6 dp by the caller, i.e. they
  * are exact integers at scale 1e6; the aggregate accumulates
  * `[n, Σkᵢ (d terms, scale 1e6), Σkᵢkⱼ (upper triangle, d(d+1)/2
  * terms, scale 1e12)]` in EXACT integer arithmetic, so the result is
  * a pure function of the input multiset — independent of partition
  * count, row order, and merge tree shape (the repo's decimal-sum
  * parity rule, `SparkEntry.scala` preamble). For d = 64 that is
  * 2 145 slots (~17 KB) per group regardless of corpus size: map-side
  * combine ships one fixed-size buffer per partition, no d²-fold row
  * explosion and no driver-side iteration.
  *
  * Hot path stays primitive: per-slot `long` accumulators with
  * `Math.addExact`; on (astronomically rare) overflow the longs spill
  * into per-slot `BigInteger` totals and accumulation continues — so
  * exactness holds at ANY corpus size while the common case never
  * allocates. eval emits the sums as DECIMAL(38,0) so downstream
  * covariance math ([[graft.operators.Pca]]) is exact integer algebra
  * until one final double division. Vectors not of length `dim` are
  * skipped (the F7 dim-guard semantics).
  */
case class CovMomentsAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovMomentsAgg.Buf] {

  require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")

  private val tri = dim * (dim + 1) / 2
  private val slots = dim + tri

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)
  override def prettyName: String = "cov_moments"

  override def createAggregationBuffer(): CovMomentsAgg.Buf =
    new CovMomentsAgg.Buf(slots)

  // hoisted element accessor — resolved once, not per element
  @transient private lazy val getElem: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        (a, i) => a.getFloat(i).toDouble
      case _ => (a, i) => a.getDouble(i)
    }

  override def update(buf: CovMomentsAgg.Buf, input: InternalRow)
      : CovMomentsAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        // inputs are 6-dp-rounded doubles ⇒ x·1e6 is within 1 ulp of
        // an integer; rint recovers it exactly (no half-way cases).
        val k = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          k(i) = math.rint(getElem(arr, i) * 1e6).toLong
          i += 1
        }
        buf.addRow(k, dim)
      }
    }
    buf
  }

  override def merge(buf: CovMomentsAgg.Buf, other: CovMomentsAgg.Buf)
      : CovMomentsAgg.Buf = { buf.mergeFrom(other); buf }

  override def eval(buf: CovMomentsAgg.Buf): Any = {
    val out = new Array[Any](1 + slots)
    out(0) = Decimal(BigDecimal(buf.n), 38, 0)
    var i = 0
    while (i < slots) {
      out(1 + i) = Decimal(BigDecimal(buf.total(i)), 38, 0)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CovMomentsAgg.Buf): Array[Byte] = {
    // n, then per-slot exact totals as length-prefixed BigInteger bytes
    val payloads = new Array[Array[Byte]](slots)
    var total = 8
    var i = 0
    while (i < slots) {
      payloads(i) = buf.total(i).toByteArray
      total += 2 + payloads(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putLong(buf.n)
    i = 0
    while (i < slots) {
      bb.putShort(payloads(i).length.toShort)
      bb.put(payloads(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CovMomentsAgg.Buf(slots)
    buf.n = bb.getLong
    var i = 0
    while (i < slots) {
      val len = bb.getShort.toInt
      val payload = new Array[Byte](len)
      bb.get(payload)
      val v = new BigInteger(payload)
      // store exactly: long part if it fits, else spill
      if (v.bitLength() < 63) buf.lo(i) = v.longValueExact()
      else { buf.ensureHi(); buf.hi(i) = v }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CovMomentsAgg = copy(child = cs.head)
}

object CovMomentsAgg {

  /** Exact integer accumulator: per-slot `long` fast path, BigInteger
    * spill on overflow. Slot layout: [Σk (d), Σkᵢkⱼ upper-tri]. */
  final class Buf(val slots: Int) {
    var n: Long = 0L
    val lo: Array[Long] = new Array[Long](slots)
    var hi: Array[BigInteger] = null

    def ensureHi(): Unit =
      if (hi == null) hi = Array.fill(slots)(BigInteger.ZERO)

    private def spill(): Unit = {
      ensureHi()
      var i = 0
      while (i < slots) {
        if (lo(i) != 0L) {
          hi(i) = hi(i).add(BigInteger.valueOf(lo(i)))
          lo(i) = 0L
        }
        i += 1
      }
    }

    def total(i: Int): BigInteger = {
      val l = BigInteger.valueOf(lo(i))
      if (hi == null) l else hi(i).add(l)
    }

    /** All-or-nothing row add: deltas staged in scratch, then applied
      * with exact adds; overflow of the APPLY step triggers a spill of
      * the accumulators (scratch itself is a single row — products of
      * 6-dp-scaled components; overflow there means |x| > ~3e3, which
      * the dim-guard domain never produces, but it is still handled by
      * the BigInteger path). */
    def addRow(k: Array[Long], dim: Int): Unit = {
      val scratch = new Array[Long](slots)
      var bigRow: Array[BigInteger] = null
      var i = 0
      var idx = dim
      var overflow = false
      while (i < dim && !overflow) {
        scratch(i) = k(i)
        var j = i
        while (j < dim && !overflow) {
          try {
            scratch(idx) = Math.multiplyExact(k(i), k(j))
          } catch {
            case _: ArithmeticException => overflow = true
          }
          idx += 1
          j += 1
        }
        i += 1
      }
      if (overflow) {
        // gigantic components: stage the whole row as BigIntegers
        bigRow = new Array[BigInteger](slots)
        var a = 0
        while (a < dim) {
          bigRow(a) = BigInteger.valueOf(k(a))
          a += 1
        }
        var p = dim
        a = 0
        while (a < dim) {
          var b = a
          while (b < dim) {
            bigRow(p) =
              BigInteger.valueOf(k(a)).multiply(BigInteger.valueOf(k(b)))
            p += 1
            b += 1
          }
          a += 1
        }
        ensureHi()
        var s = 0
        while (s < slots) {
          hi(s) = hi(s).add(bigRow(s))
          s += 1
        }
        n += 1
        return
      }
      // apply scratch with exact adds; on overflow spill and retry once
      try {
        var s = 0
        while (s < slots) {
          lo(s) = Math.addExact(lo(s), scratch(s))
          s += 1
        }
      } catch {
        case _: ArithmeticException =>
          spill() // lo now all zero; scratch fits a long by construction
          var s = 0
          while (s < slots) {
            lo(s) = scratch(s)
            s += 1
          }
      }
      n += 1
    }

    def mergeFrom(other: Buf): Unit = {
      n += other.n
      if (hi == null && other.hi == null) {
        // all-or-nothing fast path: stage the sums, commit only if no
        // slot overflowed (a partially-applied merge would double-count
        // in the fallback below)
        val staged = new Array[Long](slots)
        var ok = true
        var i = 0
        while (i < slots && ok) {
          try { staged(i) = Math.addExact(lo(i), other.lo(i)) }
          catch { case _: ArithmeticException => ok = false }
          i += 1
        }
        if (ok) {
          System.arraycopy(staged, 0, lo, 0, slots)
          return
        }
      }
      // exact merge: everything through BigInteger
      ensureHi()
      var i = 0
      while (i < slots) {
        hi(i) = hi(i)
          .add(BigInteger.valueOf(lo(i)))
          .add(other.total(i))
        lo(i) = 0L
        i += 1
      }
    }
  }

  /** Column form: `[n, Σk…, Σkᵢkⱼ…]` exact scaled-integer moments of a
    * d-dim vector column as DECIMAL(38,0) (k at scale 1e6, products at
    * scale 1e12). */
  def covMoments(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      CovMomentsAgg(ExpressionUtils.expression(vec), dim)
        .toAggregateExpression())
}
