package graft.embed

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Text → dense vector contract (reference F7: per-page + per-query
  * embedding via an external Ollama bge-m3 model, dim 1024 —
  * `/root/reference/backend/process/parsing.py:49,95-96,113`,
  * `backend/routers/es_index.py:105-111`).
  *
  * The external-model dependency is behind this trait. Production would
  * plug an MLlib pipeline or a service client; tests and the harness use
  * [[DeterministicEmbedder]] (seeded md5 feature-hash projection) so every
  * kNN / hybrid result is reproducible with zero external services
  * (SURVEY.md §7.4 risk 1). Fixture dim is 64 (FIXTURES.md §A).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Feature-hashing embedder: tokens are md5-hashed into `dim` buckets with
  * md5-derived signs, then L2-normalized. Deterministic across JVMs (no
  * `Random`, no native libs), cheap, and preserves enough token overlap
  * structure that text-similar documents get cosine-similar vectors —
  * which is what the hybrid-search tests need.
  */
final case class DeterministicEmbedder(dim: Int = 64, seed: Long = 42L)
    extends Embedder {

  private def md5Int(s: String): Int = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    ByteBuffer.wrap(d).getInt(0)
  }

  def embed(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    toks.foreach { t =>
      val h    = md5Int(s"$seed:$t")
      val idx  = math.floorMod(h, dim)
      val sign = if (math.floorMod(h >> 16, 2) == 0) 1.0 else -1.0
      v(idx) += sign
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) new Array[Float](dim)
    else v.map(x => (x / n).toFloat)
  }
}

/** Batch embedding stage: amortizes embedder construction per PARTITION
  * (mirroring the reference's parser/model instance reuse,
  * `parsing.py:49`), never per row, and never calls out from the driver.
  * At 100 TB this is the only sane shape: the model client is initialized
  * `numPartitions` times, rows stream through it iterator-style with no
  * materialization.
  */
object BatchEmbed {
  /** Append `outCol: array<float>` computed from `textCol`. */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
      embedder: Embedder): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, ArrayType(FloatType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // embedder is constructed once per partition via closure capture;
      // a remote-model impl would open its client here.
      rows.map { r =>
        val text = Option(r.getString(idx)).getOrElse("")
        Row.fromSeq(r.toSeq :+ embedder.embed(text))
      }
    }(enc)
  }
}
