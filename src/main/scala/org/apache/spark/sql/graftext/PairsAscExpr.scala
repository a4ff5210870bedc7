// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All ascending pairs (i < j) of an array, as `array<struct<_1,_2>>`.
  * Generic over the element type (ids are strings in the LSH-band path,
  * structs in the jaccard/embedding paths).
  *
  * Replaces a nested HOF formulation (`flatten(transform(sequence ...,
  * transform(slice ...)))`): Spark evaluates higher-order-function
  * lambdas interpreted, one dispatch per produced element, which is
  * quadratic dispatch per group here. This is one eval call per row with
  * a primitive nested loop. `CodegenFallback` is fine — the cost was
  * lambda dispatch, not the lack of fusion.
  *
  * For k elements produces k*(k-1)/2 pairs — callers bound group size
  * upstream (LSH band / shingle / bucket groups).
  */
case class PairsAscExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pairs_asc needs an array input, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("_1", elemType, elemNullable),
      StructField("_2", elemType, elemNullable))), containsNull = false)

  override def prettyName: String = "pairs_asc"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n  = xs.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) { elems(i) = xs.get(i, elemType); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(elems(i), elems(j))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PairsAscExpr =
    copy(child = c)
}

object PairsAscExpr {
  def pairsAsc(xs: Column): Column =
    ExpressionUtils.column(PairsAscExpr(ExpressionUtils.expression(xs)))
}
