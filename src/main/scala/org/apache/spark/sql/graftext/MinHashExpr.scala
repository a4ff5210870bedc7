// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over an `array<string>` of shingles: element i of
  * the result is `min(md5(concat("i:", shingle)))` (lexicographic min of
  * the lowercase hex, i.e. minwise hashing in 128-bit space) — exactly
  * the value the HOF formulation
  * `array_min(transform(sh, s => md5(concat(lit("i:"), s))))` computes,
  * and exactly what the DuckDB oracle reproduces with `md5(...)`.
  *
  * One pass over the shingles computes ALL seeds: the HOF formulation
  * ran numHashes interpreted transforms, each allocating a fresh
  * MessageDigest per element inside Spark's Md5 expression. Empty input
  * yields null elements (array_min of empty = null), matching the HOF
  * path so LSH band nulling is unchanged.
  */
case class MinHashExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(numHashes >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash"

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i)     = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val sh = a.asInstanceOf[ArrayData]
    val n  = sh.numElements()
    val mins = new Array[String](numHashes) // nulls when n == 0
    if (n > 0) {
      val md = MessageDigest.getInstance("MD5")
      val seeds = Array.tabulate(numHashes)(i => s"$i:".getBytes("UTF-8"))
      var t = 0
      while (t < n) {
        val s = sh.getUTF8String(t)
        if (s != null) {
          val sb = s.getBytes
          var i = 0
          while (i < numHashes) {
            md.reset()
            md.update(seeds(i))
            md.update(sb)
            val h = hex(md.digest())
            if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
            i += 1
          }
        }
        t += 1
      }
    }
    new GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(m))
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): MinHashExpr =
    copy(child = c)
}

object MinHashExpr {
  def minhash(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashExpr(
      ExpressionUtils.expression(shingles), numHashes))
}
