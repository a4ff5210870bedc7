package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.text.TextAnalysis

/** Model-based quality filtering — the classifier stage of the
  * GPT-3/LLaMA-style curation pipelines (a small trained model scores
  * every document; the pipeline keeps the confident tail). The model is
  * a linear classifier over INTERPRETABLE, engine-portable text
  * features, so scoring is one codegen'd per-row expression with an
  * exact SQL twin, and the trained coefficients are model state (the
  * same status as a centroid table or a query embedding — frozen at
  * scoring time, refit offline).
  *
  * Features (deterministic column algebra, no UDF):
  *   f1 ln(1+chars)          f2 alphanumeric ratio
  *   f3 punctuation/token    f4 mean word length
  *   f5 en-stopword distinct-hit ratio ([[TextAnalysis.langScore]])
  *
  * Scale shape: [[score]] is a single scan (shuffle-free, the filter
  * stage fuses into whatever reads it); [[train]] aggregates the same
  * feature relation through MLlib LogisticRegression — the gradient
  * passes are treeAggregates over |corpus| rows, the model itself is
  * NumFeatures doubles.
  */
object QualityClassifier {

  val NumFeatures = 5

  private val EnMarkers: Seq[String] = TextAnalysis.Stopwords.toMap.apply("en")

  /** The feature vector as an `array<double>` column. Raw length counts
    * are let-bound so each regex runs once per row. */
  def features(textCol: Column): Column =
    TextFunctions.bind(
      array(length(textCol).cast("double"),
        length(regexp_replace(textCol, "[^A-Za-z0-9]", "")).cast("double"),
        length(regexp_replace(textCol, "[^.,;:!?]", "")).cast("double"),
        TextFunctions.tokenCount(textCol).cast("double")),
      m => TextFunctions.bind(TextFunctions.tokens(textCol), toks => {
        val len   = element_at(m, 1)
        val alnum = element_at(m, 2)
        val punct = element_at(m, 3)
        val nTok  = element_at(m, 4)
        array(
          log(lit(1.0) + len),
          when(len === 0, 0.0).otherwise(alnum / len),
          punct / greatest(nTok, lit(1.0)),
          when(nTok === 0, 0.0).otherwise(alnum / nTok),
          TextAnalysis.langScore(toks, EnMarkers))
      }))

  /** Apply a FROZEN model: `p = sigmoid(b + w·f)` rounded to 1e-6,
    * `keep = p >= threshold` on the rounded value (engine-portable).
    * Returns (idCol, quality_p, keep). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double], intercept: Double,
      threshold: Double = 0.5): DataFrame = {
    require(weights.length == NumFeatures,
      s"expected $NumFeatures weights, got ${weights.length}")
    val z = TextFunctions.bind(features(col(textCol)), f =>
      weights.zipWithIndex.foldLeft(lit(intercept): Column) {
        case (acc, (w, i)) => acc + lit(w) * element_at(f, i + 1)
      })
    docs
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality_p"))
      .withColumn("keep", col("quality_p") >= threshold)
  }

  /** Fit the linear model with MLlib LogisticRegression over the SAME
    * feature expression [[score]] applies. Returns (weights, intercept)
    * — the frozen model state. `labelCol` is any 0/1-castable column
    * (weak labels: a trusted-source flag, a heuristic, a hand-labeled
    * sample). */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      maxIter: Int = 100, regParam: Double = 0.0): (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val df = docs.select(col(labelCol).cast("double").as("label"),
      array_to_vector(features(col(textCol))).as("featv"))
    val m = new LogisticRegression().setMaxIter(maxIter)
      .setRegParam(regParam).setFeaturesCol("featv").setLabelCol("label")
      .fit(df)
    (m.coefficients.toArray, m.intercept)
  }
}
