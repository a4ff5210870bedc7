// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native SimHash over an `array<long>` of token hashes: for each of
  * `nBits` bit positions, a majority vote across tokens decides the
  * output bit. The HOF formulation ran `nBits` interpreted
  * aggregate-lambdas per row (nBits x nTokens lambda dispatches); this
  * is one primitive nested loop inside whole-stage codegen.
  *
  * Bit-for-bit identical to the composition in `Dedup.simhash`: the
  * per-bit vote `sum(((h >> i) & 1) * 2 - 1)` equals `2*ones - n`, an
  * order-independent integer sum.
  */
case class SimHashExpr(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n  = hs.numElements()
    val ones = new Array[Int](nBits)
    var t = 0
    while (t < n) {
      val h = hs.getLong(t)
      var i = 0
      while (i < nBits) { ones(i) += ((h >> i) & 1L).toInt; i += 1 }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < nBits) {
      if (2 * ones(i) - n > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val ones = ctx.freshName("ones")
      val t = ctx.freshName("t"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $ones = new int[$nBits];
         |for (int $t = 0; $t < $n; $t++) {
         |  final long $h = $a.getLong($t);
         |  for (int $i = 0; $i < $nBits; $i++) {
         |    $ones[$i] += (int) (($h >> $i) & 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $nBits; $i++) {
         |  if (2 * $ones[$i] - $n > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
}

object SimHashExpr {
  def simhash(hashes: Column, nBits: Int): Column =
    ExpressionUtils.column(SimHashExpr(
      ExpressionUtils.expression(hashes), nBits))
}
