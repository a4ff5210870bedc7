// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array: `["a","b","c"], n=2` →
  * `["a b","b c"]`; fewer than n tokens → empty array. Byte-identical
  * to the HOF formulation in `TextFunctions.shingles`
  * (`concat_ws(" ", toks[i..i+n-1])`) but one eval per row instead of
  * an interpreted lambda (itself doing n `element_at` probes) per
  * produced shingle. CodegenFallback: the cost was dispatch.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val len  = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val ts = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ts(i) = toks.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      // n==1: null token → "" — concat_ws yields "" for an all-null
      // window, never null, and the output type promises containsNull=false
      if (n == 1) out(i) =
        if (ts(i) == null) UTF8String.EMPTY_UTF8 else ts(i)
      else {
        // mirror concat_ws(" ", ...): nulls are skipped by concatWs
        val window = new Array[UTF8String](n)
        var k = 0
        while (k < n) { window(k) = ts(i + k); k += 1 }
        out(i) = UTF8String.concatWs(space, window: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

object ShinglesExpr {
  def shingles(toks: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesExpr(
      ExpressionUtils.expression(toks), n))
}
