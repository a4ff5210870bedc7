// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Robust-winnowing fingerprint set over a (pre-normalized) string:
  * 60-bit md5 hashes of every k-char shingle, minimum per w-window,
  * distinct survivors in first-occurrence order — exactly the values of
  * the HOF formulation in `TextAnalysis.winnowFingerprints` (md5Long =
  * first 15 hex chars of md5 as a long; shingle i = chars [i, i+k);
  * < k chars hashes the whole string; < w shingles keeps one min), and
  * exactly what the DuckDB oracle reproduces with `md5`/`list_min`.
  *
  * One primitive loop per row with a single reused MessageDigest. The
  * HOF formulation evaluates ~(len·w) interpreted lambda calls per row
  * and allocates a digest per shingle inside Spark's Md5 — the same
  * reason [[MinHashExpr]] and [[ShinglesExpr]] exist.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  /** Long value of the first 15 hex chars of the digest: bytes 0..6
    * whole (14 hex chars) plus the high nibble of byte 7 — identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)`. */
  private def md5Long(md: MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val md = MessageDigest.getInstance("MD5")
    val nChars = s.numChars()
    if (nChars < k)
      return new GenericArrayData(Array(md5Long(md, s.getBytes)))
    val nSh = nChars - k + 1
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      hs(i) = md5Long(md, s.substring(i, i + k).getBytes)
      i += 1
    }
    if (nSh < w) {
      var m = hs(0)
      i = 1
      while (i < nSh) { if (hs(i) < m) m = hs(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j + w <= nSh) {
      var m = hs(j)
      var t = 1
      while (t < w) { if (hs(j + t) < m) m = hs(j + t); t += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
}

object WinnowExpr {
  /** Column form over an already-normalized string. */
  def winnow(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowExpr(ExpressionUtils.expression(text), k, w))
}
