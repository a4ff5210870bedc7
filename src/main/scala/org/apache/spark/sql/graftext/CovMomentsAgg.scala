// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass second-moment accumulation over a vector column — the
  * distributed building block for a covariance matrix / PCA over
  * embeddings. The buffer is `[n, Σxᵢ (d terms), Σxᵢxⱼ (upper
  * triangle, d(d+1)/2 terms)]`: for d = 64 that is 2 145 doubles
  * (~17 KB) per group regardless of corpus size, so the whole
  * covariance computation is ONE partial-aggregated scan — map-side
  * combine ships a single fixed-size buffer per partition, no
  * d²-fold row explosion (the posexplode-pairs formulation multiplies
  * a 100 TB scan by d²/2) and no driver-side iteration.
  *
  * The CALLER pre-rounds inputs to 6 dp (with Spark's own `round`,
  * whose DuckDB parity the q79 centroid discipline already proves),
  * so both engines sum the SAME multiset of doubles;
  * cross-partition association differences are ~1e-15 relative and
  * the caller rounds final covariances to 6 dp.
  *
  * eval emits `[n, Σx, Σxy]` verbatim; [[graft.operators.Pca]]
  * turns the moments into covariance entries (cov(i,j) =
  * Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n)) and, driver-side, eigenvectors — the
  * d×d matrix is index-metadata-sized, like IVF centroids. Vectors
  * not of length `dim` are skipped (the F7 dim-guard semantics).
  */
case class CovMomentsAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")

  private val tri = dim * (dim + 1) / 2
  private val len = 1 + dim + tri

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, false)
  override def prettyName: String = "cov_moments"

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](len)

  // hoisted element accessor — resolved once, not per element
  @transient private lazy val getElem: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        (a, i) => a.getFloat(i).toDouble
      case _ => (a, i) => a.getDouble(i)
    }

  override def update(buf: Array[Double], input: InternalRow)
      : Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val x = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          x(i) = getElem(arr, i)
          i += 1
        }
        buf(0) += 1.0
        i = 0
        var k = 1 + dim
        while (i < dim) {
          buf(1 + i) += x(i)
          var j = i
          while (j < dim) {
            buf(k) += x(i) * x(j)
            k += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double])
      : Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(d => d: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    var i = 0
    while (i < len) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val a = new Array[Double](len)
    var i = 0
    while (i < len) { a(i) = bb.getDouble; i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(o: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CovMomentsAgg = copy(child = cs.head)
}

object CovMomentsAgg {
  /** Column form: `[n, Σx…, Σxy…]` moments of a d-dim vector column. */
  def covMoments(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      CovMomentsAgg(ExpressionUtils.expression(vec), dim)
        .toAggregateExpression())
}
