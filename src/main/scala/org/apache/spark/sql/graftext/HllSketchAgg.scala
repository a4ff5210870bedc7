// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}

/** HyperLogLog distinct-count sketch as a single-pass aggregate with an
  * engine-portable definition (Flajolet et al. 2007, the ES
  * `cardinality` aggregation's algorithm).
  *
  * The buffer is `m = 64` one-byte registers; `update` costs one md5 and
  * two bit ops per row; `merge` is an elementwise max — only 64 bytes
  * per group cross the wire regardless of cardinality (vs k longs for
  * KMV, m rows/group for the DF-algebra form). That merge-only state is
  * what makes it THE 100 TB cardinality primitive: partial aggregation
  * combines map-side, and sketches for different days/partitions can be
  * unioned after the fact.
  *
  * Unlike Spark's `approx_count_distinct` (HLL++, implementation-specific
  * bias tables), every step here is reproducible on any engine — the
  * DuckDB oracle rebuilds the registers in SQL and lands on the
  * bit-identical estimate:
  *  - `h`      = first 15 hex chars of md5(value), base-16 (60-bit, ≥ 0);
  *  - bucket   = h & 63 (low 6 bits), w = h >>> 6 (54 bits);
  *  - rho      = 55 - bitLength(w)  (= leading-zero count of w in 54
  *               bits, plus one; 55 when w = 0);
  *  - register = max(rho) per bucket.
  * The harmonic sum is kept in INTEGER space — `sumInt = Σ 2^(55-reg)`
  * (≤ 64·2^55 < 2^62, exact in a Long) — so no float-summation order can
  * differ between engines; the estimate `0.709·m²·2^55 / sumInt` is one
  * deterministic double division. Small-range (linear counting)
  * correction: if est ≤ 2.5m and zero registers exist, `m·ln(m/V)`.
  */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypes {

  import HllSketchAgg._

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_distinct"

  // one digest per task, not per row (thread-confined within a task)
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = md5Long60(md,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val bucket = (h & (M - 1)).toInt
      val w      = h >>> P
      val rho    = (MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllSketchAgg = copy(child = cs.head)
}

object HllSketchAgg {
  val P: Int      = 6        // register-index bits
  val M: Int      = 1 << P   // 64 registers
  val MaxRho: Int = 60 - P + 1
  val Alpha: Double = 0.709  // standard alpha_64
  private val Pow55: Double = math.pow(2.0, MaxRho.toDouble)

  /** First 15 hex chars of md5 as a long (TextFunctions.md5Long). */
  private[graftext] def md5Long60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  /** Register array → estimate; integer harmonic sum (see class doc). */
  def estimate(regs: Array[Byte]): Double = {
    var sumInt = 0L
    var zeros  = 0
    var j = 0
    while (j < M) {
      sumInt += 1L << (MaxRho - regs(j))
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    val raw = Alpha * M * M * Pow55 / sumInt.toDouble
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }

  /** Column form: HLL distinct-count estimate of `key` (stringified by
    * the caller). */
  def hllDistinct(key: Column): Column =
    ExpressionUtils.column(
      HllSketchAgg(ExpressionUtils.expression(key)).toAggregateExpression())
}
