package graft.pipeline

import graft.operators.Ckpt.CkptOps
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

  /** `p = sigmoid(b + w·f)` of one text column, rounded to 1e-6 —
    * the scoring expression [[score]] and [[calibration]] share. */
  def probability(textCol: Column, weights: Seq[Double],
      intercept: Double): Column = {
    require(weights.length == NumFeatures,
      s"expected $NumFeatures weights, got ${weights.length}")
    val z = TextFunctions.bind(features(textCol), f =>
      weights.zipWithIndex.foldLeft(lit(intercept): Column) {
        case (acc, (w, i)) => acc + lit(w) * element_at(f, i + 1)
      })
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Calibration table of a frozen model against a deterministic truth
    * column — the reliability diagram a curation pipeline checks
    * before trusting classifier thresholds (an over-confident quality
    * model silently skews the kept corpus). `p` is binned into
    * `nBins` equal-width bins; per bin: document count, positives,
    * average predicted probability and observed positive rate — a
    * calibrated model has avg_p ≈ pos_rate per bin.
    *
    * ONE scan + one fixed-cardinality groupBy (map-side combined).
    * All ratios are integer-ppm divisions (LONG `div`, then one exact
    * double divide) — a ratio of integers can land exactly on a
    * round-6 half-boundary where engine rounding modes diverge. */
  def calibration(docs: DataFrame, textCol: String,
      weights: Seq[Double], intercept: Double, truthCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need nBins >= 2")
    val p = probability(col(textCol), weights, intercept)
    val base = docs.select(
      least(floor(p * nBins).cast("int"), lit(nBins - 1)).as("bin"),
      (p.cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 1000000)
        .cast("long").as("p_ppm"),
      truthCol.cast("long").as("pos"))
    base.groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pos")).as("n_pos"),
        sum(col("p_ppm")).as("sum_p_ppm"))
      .withColumn("avg_p",
        expr("(sum_p_ppm div n_docs)").cast("double") / lit(1000000.0))
      .withColumn("pos_rate",
        expr("((n_pos * 1000000) div n_docs)").cast("double")
          / lit(1000000.0))
      .select("bin", "n_docs", "n_pos", "avg_p", "pos_rate")
      .orderBy("bin")
  }

  /** Murphy decomposition of the Brier score (Murphy 1973; the
    * generalized form of Stephenson et al. 2008 for UNBINNED
    * forecasts) over the frozen model — [[calibration]]'s reliability
    * diagram and q268's ECE reduced to the standard accounting:
    *
    *   brier = rel − res + unc + wbv − 2·wbc
    *
    * rel (reliability): how far bin forecasts sit from bin outcomes —
    * the calibration error being paid; res (resolution): how far bin
    * outcomes spread from the base rate — the signal the forecasts DO
    * carry; unc: the base rate's own variance ō(1−ō) — the floor no
    * forecaster beats; wbv/wbc: within-bin forecast variance and
    * forecast–outcome covariance, the residuals the binned
    * decomposition leaves for a continuous forecaster (both zero iff
    * forecasts are constant per bin — the classic three-term case).
    *
    * One scan to the bin aggregates + one broadcast-join scan for the
    * per-doc terms. Per-term doubles are 9-dp DECIMAL-summed (the χ²
    * discipline), so every figure is engine-exact; the res numerator
    * d = pos_k·N − P·n_k is an exact integer. Returns one row
    * (n, brier, rel, res, unc, wbv, wbc). */
  def brierDecomposition(docs: DataFrame, textCol: String,
      weights: Seq[Double], intercept: Double, truthCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need nBins >= 2")
    val d289 = org.apache.spark.sql.types.DecimalType(28, 9)
    val p = probability(col(textCol), weights, intercept)
    val base = docs.select(
      least(floor(p * nBins).cast("int"), lit(nBins - 1)).as("bin"),
      p.as("qp"), truthCol.cast("long").as("pos"))
      .graftCheckpoint(false) // bin aggregate + per-doc term consumers
    val bins = base.groupBy("bin")
      .agg(count(lit(1)).as("n_k"), sum(col("pos")).as("pos_k"),
        sum(round(col("qp"), 9).cast(d289)).as("sum_p"))
      .graftCheckpoint(false) // bin terms + totals + per-doc join
    val tot = broadcast(bins.agg(sum(col("n_k")).as("n"),
      sum(col("pos_k")).as("np")))
    val binMean = bins.select(col("bin"),
      (col("sum_p").cast("double") / col("n_k").cast("double"))
        .as("pbar"),
      (col("pos_k").cast("double") / col("n_k").cast("double"))
        .as("obar"))
    val perDoc = base.join(broadcast(binMean), "bin")
      .select(
        round((col("qp") - col("pos").cast("double"))
          * (col("qp") - col("pos").cast("double")), 9).cast(d289)
          .as("bt"),
        round((col("qp") - col("pbar")) * (col("qp") - col("pbar")), 9)
          .cast(d289).as("wt"),
        round((col("qp") - col("pbar"))
          * (col("pos").cast("double") - col("obar")), 9).cast(d289)
          .as("ct"))
      .agg(sum(col("bt")).as("bsum"), sum(col("wt")).as("wsum"),
        sum(col("ct")).as("csum"))
    val binTerms = bins.crossJoin(tot)
      .select(
        // rel: n_k·(p̄−ō)² = (Σp − pos_k)²/n_k
        round((col("sum_p").cast("double") - col("pos_k").cast("double"))
          * (col("sum_p").cast("double") - col("pos_k").cast("double"))
          / col("n_k").cast("double"), 9).cast(d289).as("rt"),
        // res: n_k·(ō_k−ō)² = d²/(n_k·N²), d = pos_k·N − P·n_k exact
        round((col("pos_k") * col("n") - col("np") * col("n_k"))
          .cast("double")
          * (col("pos_k") * col("n") - col("np") * col("n_k"))
            .cast("double")
          / (col("n_k").cast("double") * col("n").cast("double")
            * col("n").cast("double")), 9).cast(d289).as("st"))
      .agg(sum(col("rt")).as("rsum"), sum(col("st")).as("ssum"))
    perDoc.crossJoin(binTerms).crossJoin(tot)
      .select(col("n"),
        round(col("bsum").cast("double") / col("n").cast("double"), 6)
          .as("brier"),
        round(col("rsum").cast("double") / col("n").cast("double"), 6)
          .as("rel"),
        round(col("ssum").cast("double") / col("n").cast("double"), 6)
          .as("res"),
        round(col("np").cast("double") / col("n").cast("double")
          * (lit(1.0) - col("np").cast("double")
            / col("n").cast("double")), 6).as("unc"),
        round(col("wsum").cast("double") / col("n").cast("double"), 6)
          .as("wbv"),
        round(col("csum").cast("double") / col("n").cast("double"), 6)
          .as("wbc"))
  }

  /** Uncertainty sampling (active learning): the `k` documents the
    * frozen model is LEAST sure about (|p − ½| smallest), with a
    * per-source diversity cap so one noisy source can't absorb the
    * whole labeling batch — the "what should humans label next"
    * selector that grows the q133 classifier's training set fastest.
    * Ranking uses the 6-dp-ROUNDED uncertainty (id tiebreak), so the
    * batch is engine-exact; the per-source window partitions by
    * source (bounded), the final cut is TakeOrdered. Returns
    * (doc_id, source, quality_p, uncertainty). */
  def uncertaintySample(docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String, weights: Seq[Double],
      intercept: Double, perSourceCap: Int, k: Int): DataFrame = {
    require(perSourceCap >= 1 && k >= 1)
    import org.apache.spark.sql.expressions.Window
    val p = probability(col(textCol), weights, intercept)
    val scored = docs.select(col(idCol).as("doc_id"),
        col(sourceCol).as("source"), p.as("quality_p"))
      .withColumn("uncertainty",
        round(abs(col("quality_p") - 0.5), 6))
    val w = Window.partitionBy("source")
      .orderBy(col("uncertainty").asc, col("doc_id").asc)
    scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= perSourceCap).drop("__r")
      .orderBy(col("uncertainty").asc, col("doc_id").asc).limit(k)
  }

  /** Apply a FROZEN model: `p = sigmoid(b + w·f)` rounded to 1e-6,
    * `keep = p >= threshold` on the rounded value (engine-portable).
    * Returns (idCol, quality_p, keep). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double], intercept: Double,
      threshold: Double = 0.5): DataFrame =
    docs
      .select(col(idCol),
        probability(col(textCol), weights, intercept).as("quality_p"))
      .withColumn("keep", col("quality_p") >= threshold)

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
