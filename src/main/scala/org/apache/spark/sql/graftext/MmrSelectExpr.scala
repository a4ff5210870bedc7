// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Greedy MMR selection over a COLLECTED candidate shortlist — the
  * whole O(N²·k) loop as ONE native expression, so the diversified
  * rerank is a single aggregate stage instead of k chained
  * TakeOrdered(1) sub-plans (measured 9 s → sub-second at sf0.1: the
  * chained form pays ~3 shuffles × k sequential Spark stages in
  * scheduling alone; the shortlist is bounded by serving config, so
  * the loop itself is microseconds).
  *
  * Input: array<struct<id: long, rel: double, vec: array<float>>>.
  * Output: array<struct<pos: int, id: long, mmr: double>> — pos is the
  * 1-based pick order; pick 1 is pure argmax(rel), pick t maximizes
  * `λ·rel − (1−λ)·max_{s∈picked} sim(d,s)`.
  *
  * Determinism (cross-engine-oracle discipline): pairwise cosines use
  * the exact [[CosineSimilarityExpr]] arithmetic (left-fold doubles,
  * √·√ denominator, 0 on zero norm) and are rounded to 6 dp
  * HALF_UP — identical to `round(col, 6)` and DuckDB `round(x, 6)`;
  * the λ-combination is `λ·rel − (1.0−λ)·maxsim` in doubles; every
  * argmax tie-breaks by ascending id, and the scan is
  * order-independent (strictly-greater-or-smaller-id replacement), so
  * the result does not depend on collect_list arrival order.
  */
// CodegenFallback: the selection runs once per QUERY (one collected
// shortlist row), never per corpus row — codegen would buy nothing.
case class MmrSelectExpr(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(
    StructType(Seq(
      StructField("id", LongType), StructField("rel", DoubleType),
      StructField("vec", ArrayType(FloatType))))))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))))

  override def prettyName: String = "mmr_select"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids  = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      val v = row.getArray(2)
      val d = new Array[Double](v.numElements())
      var j = 0
      while (j < d.length) { d(j) = v.getFloat(j).toDouble; j += 1 }
      vecs(i) = d
      i += 1
    }

    val picked = new Array[Boolean](n)
    // running max-sim-to-picked per candidate, updated after each pick
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var t = 0
    while (t < kk) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < n) {
        if (!picked(c)) {
          val score =
            if (t == 0) rels(c)
            else lambda * rels(c) - (1.0 - lambda) * maxSim(c)
          val s6 = round6(score)
          if (best < 0 || s6 > bestScore ||
              (s6 == bestScore && ids(c) < ids(best))) {
            best = c; bestScore = s6
          }
        }
        c += 1
      }
      picked(best) = true
      out(t) = InternalRow(t + 1, ids(best), bestScore)
      // fold the new pick into every remaining candidate's max-sim
      var r = 0
      while (r < n) {
        if (!picked(r)) {
          val s = round6(cos(vecs(r), vecs(best)))
          if (s > maxSim(r)) maxSim(r) = s
        }
        r += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelectExpr =
    copy(child = newChild)
}

object MmrSelectExpr {
  /** Column-API entry point. */
  def mmrSelect(cands: Column, k: Int, lambda: Double): Column =
    ExpressionUtils.column(MmrSelectExpr(
      ExpressionUtils.expression(cands), k, lambda))
}
