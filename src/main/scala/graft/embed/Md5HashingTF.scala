package graft.embed

import java.security.MessageDigest

import org.apache.spark.ml.UnaryTransformer
import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.ml.param.{IntParam, ParamMap, ParamValidators}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.types.DataType

/** Term-frequency stage with md5 bucketing — a drop-in replacement for
  * MLlib's `HashingTF` whose bucket assignment is
  * `conv(substring(md5(tok), 1, 15), 16, 10) % numFeatures`, i.e. the
  * exact function `TextFunctions.md5Long` evaluates in Spark SQL and an
  * external engine evaluates as plain SQL. Swapping murmur3 for md5 is
  * what makes the whole MLlib pipeline (tokenize → TF → IDF →
  * Normalizer) oracle-checkable end-to-end (q58): murmur3 has no SQL
  * form, md5 does. Math is otherwise identical to HashingTF (raw term
  * counts into a sparse vector).
  */
final class Md5HashingTF(override val uid: String)
    extends UnaryTransformer[Seq[String], Vector, Md5HashingTF] {

  def this() = this(Identifiable.randomUID("md5HashingTF"))

  final val numFeatures: IntParam = new IntParam(this, "numFeatures",
    "number of buckets", ParamValidators.gt(0))
  setDefault(numFeatures -> 64)
  def setNumFeatures(n: Int): this.type = set(numFeatures, n)
  def getNumFeatures: Int = $(numFeatures)

  override protected def createTransformFunc: Seq[String] => Vector = {
    val dim = $(numFeatures)
    toks => {
      val counts = scala.collection.mutable.HashMap.empty[Int, Double]
      toks.foreach { t =>
        val b = Md5HashingTF.bucket(t, dim)
        counts(b) = counts.getOrElse(b, 0.0) + 1.0
      }
      Vectors.sparse(dim, counts.toSeq)
    }
  }

  override protected def outputDataType: DataType = SQLDataTypes.VectorType

  override def copy(extra: ParamMap): Md5HashingTF = defaultCopy(extra)
}

object Md5HashingTF {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** JVM evaluation of the SQL bucket function
    * `conv(substring(md5(tok), 1, 15), 16, 10) % dim`: first 15 hex
    * chars of the md5 (60 bits, always a positive long) mod dim. */
  def bucket(tok: String, dim: Int): Int = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(tok.getBytes("UTF-8"))
    // first 15 hex chars = 7.5 bytes: 7 full bytes + the high nibble
    var l = 0L
    var i = 0
    while (i < 7) { l = (l << 8) | (bytes(i) & 0xffL); i += 1 }
    l = (l << 4) | ((bytes(7) & 0xf0L) >> 4)
    (l % dim).toInt
  }

  /** Hex rendering used by tests to cross-check against SQL md5(). */
  private[embed] def md5Hex(s: String): String = {
    val b = digest.get()
    b.reset()
    b.digest(s.getBytes("UTF-8")).flatMap(x =>
      Array(HexChars((x & 0xf0) >> 4), HexChars(x & 0x0f))).mkString
  }
}
