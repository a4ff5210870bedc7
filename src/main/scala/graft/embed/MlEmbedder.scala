package graft.embed

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib batch-embedding pipeline — the BASELINE approach ("MLlib for
  * batch embedding generation") made concrete: RegexTokenizer →
  * HashingTF(dim) → IDF (fit over the corpus) → L2 Normalizer, i.e. a
  * seeded TF-IDF embedding. Fully deterministic: HashingTF is
  * murmur3-seeded (constant seed inside MLlib), IDF is a closed-form
  * statistic, no RNG anywhere.
  *
  * `fit` runs the one corpus pass IDF needs and returns a [[Fitted]]
  * that (a) transforms whole corpora distributed (`transformCorpus`),
  * and (b) implements [[Embedder]], embedding query strings driver-side
  * through the SAME hash and idf weights (`HashingTF.indexOf` + the
  * broadcast-size idf vector) — so corpus and query vectors live in one
  * space, the property hybrid/kNN search needs. MlEmbedderSpec pins
  * corpus-vs-query consistency.
  *
  * 100 TB shape: IDF's fit is one aggregate over the corpus (document
  * frequencies, `dim`-bounded state); transform is per-row and
  * shuffle-free; the fitted state carried to executors/driver is just
  * the `dim`-length idf array.
  *
  * The TF stage's hash is pluggable (`hash` parameter): "murmur3" is
  * MLlib's stock `HashingTF` (the production default — fastest, but no
  * SQL form, so checkable only structurally); "md5" swaps in
  * [[Md5HashingTF]], whose bucket function IS SQL-expressible, making
  * the whole pipeline oracle-checkable end-to-end (q58). MlEmbedderSpec
  * pins that at a dim where both hashes are injective on the corpus
  * vocabulary the two spaces produce the same cosine neighborhoods —
  * the hash is the ONLY thing that differs.
  */
object MlEmbedder {

  val TokenPattern = "[^a-z0-9]+"

  /** Fitted TF-IDF embedding: `idf` is the per-bucket weight vector the
    * corpus pass produced; `hash` selects the bucket function and must
    * match the one the corpus was transformed with. */
  final case class Fitted(dim: Int, idf: Array[Double],
      hash: String = "murmur3") extends Embedder {
    @transient private lazy val hasher =
      new HashingTF().setNumFeatures(dim)

    private def bucketOf(t: String): Int =
      if (hash == "md5") Md5HashingTF.bucket(t, dim) else hasher.indexOf(t)

    /** Query-side embed in full double precision: same tokenize → hash
      * → tf → idf → L2 as the corpus transform, executed locally (no
      * job per query). */
    def embedDouble(text: String): Array[Double] = {
      val tf = new Array[Double](dim)
      text.toLowerCase.split(TokenPattern).filter(_.nonEmpty)
        .foreach(t => tf(bucketOf(t)) += 1.0)
      var i = 0
      var ss = 0.0
      while (i < dim) { tf(i) *= idf(i); ss += tf(i) * tf(i); i += 1 }
      val n = math.sqrt(ss)
      if (n == 0.0) new Array[Double](dim) else tf.map(_ / n)
    }

    def embed(text: String): Array[Float] = embedDouble(text).map(_.toFloat)
  }

  private def pipeline(textCol: String, dim: Int, hash: String): Pipeline = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__toks")
      .setPattern(TokenPattern).setToLowercase(true).setMinTokenLength(1)
    val tf = hash match {
      case "md5" => new Md5HashingTF().setNumFeatures(dim)
        .setInputCol("__toks").setOutputCol("__tf")
      case _ => new HashingTF().setInputCol("__toks").setOutputCol("__tf")
        .setNumFeatures(dim)
    }
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
    val norm = new Normalizer().setInputCol("__tfidf").setOutputCol("__vec")
      .setP(2.0)
    new Pipeline().setStages(Array(tok, tf, idf, norm))
  }

  /** One corpus pass (document frequencies) → fitted embedder. */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 64,
      hash: String = "murmur3"): Fitted = {
    val model = pipeline(textCol, dim, hash).fit(corpus)
    val idfModel = model.stages.collectFirst {
      case m: org.apache.spark.ml.feature.IDFModel => m
    }.get
    Fitted(dim, idfModel.idf.toArray, hash)
  }

  /** Distributed corpus embedding: appends `outCol` (array<float>, or
    * array<double> with `doubleOut` — the oracle-checked q58 path keeps
    * doubles end-to-end so cross-engine rounding at 6dp is stable).
    * Refits the pipeline (same one corpus pass as [[fit]]) so transform
    * and fit share a lineage; per-row work is shuffle-free. */
  def transformCorpus(corpus: DataFrame, textCol: String, outCol: String,
      dim: Int = 64, hash: String = "murmur3",
      doubleOut: Boolean = false): DataFrame = {
    val model = pipeline(textCol, dim, hash).fit(corpus)
    model.transform(corpus)
      .withColumn(outCol,
        vector_to_array(col("__vec"), if (doubleOut) "float64" else "float32"))
      .drop("__toks", "__tf", "__tfidf", "__vec")
  }
}
