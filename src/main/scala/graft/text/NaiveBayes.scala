package graft.text

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Engine-exact multinomial Naive Bayes — the counting-based text
  * classifier that trains in ONE aggregation pass (the reason NB is
  * the only classical classifier that is TRIVIALLY distributed: the
  * sufficient statistics are just (class, token) counts). Paired with
  * an in-plan evaluation pass, it is the supervised companion to the
  * heuristic quality/language scorers (q16, q133): same corpus scan
  * shape, but the weights come from data.
  *
  * Determinism: training is integer counts; every log term (add-1
  * smoothed likelihoods, priors) is an identical double expression
  * rounded to 9 dp, and per-document log-scores are DECIMAL term sums
  * — partition-order-free — with argmax ties broken to the smallest
  * class label via exact struct ordering. */
object NaiveBayes {

  /** Train on `trainPred` docs, classify the rest, and return the
    * confusion matrix (lang_true, lang_pred, n) ordered by both —
    * integer-exact cells. Empty test documents are classified by
    * prior alone (they still appear in the matrix). */
  def trainEvalConfusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainPred: Column): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(labelCol).as("lab"), trainPred.as("tr"), col(textCol).as("txt"))
    val toks = base.select(col("doc_id"), col("lab"), col("tr"),
      explode(TextFunctions.tokens(col("txt"))).as("tok"))

    val classes = base.filter(col("tr"))
      .groupBy(col("lab").as("c")).agg(count(lit(1)).as("ndocs"))
      .graftCheckpoint(true) // |classes| rows, feeds prior + grid legs
    val nd = broadcast(classes.agg(sum(col("ndocs")).as("nd")))
    val prior = broadcast(classes.crossJoin(nd)
      .select(col("c"),
        round(log(col("ndocs").cast("double") / col("nd").cast("double")),
          9).cast(DecimalType(28, 9)).as("pr")))

    val counts = toks.filter(col("tr"))
      .groupBy(col("lab").as("c"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .graftCheckpoint(true) // vocabulary × classes — feeds two legs
    val classTok = broadcast(counts.groupBy("c")
      .agg(sum(col("cnt")).as("ctok")))
    val vocabN = broadcast(counts.agg(countDistinct(col("tok")).as("vn")))

    val testToks = toks.filter(!col("tr"))
    val termSums = testToks
      .crossJoin(broadcast(classes.select("c")))
      .join(counts, Seq("c", "tok"), "left")
      .join(classTok, "c").crossJoin(vocabN)
      .select(col("doc_id"), col("c"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1L).cast("double")
          / (col("ctok") + col("vn")).cast("double")), 9)
          .cast(DecimalType(28, 9)).as("t"))
      .groupBy("doc_id", "c").agg(sum(col("t")).as("s"))

    val allTest = base.filter(!col("tr")).select(col("doc_id"), col("lab"))
    val scored = allTest
      .crossJoin(broadcast(classes.select("c")))
      .join(termSums, Seq("doc_id", "c"), "left")
      .join(prior, "c")
      .select(col("doc_id"), col("lab"), col("c"),
        (coalesce(col("s"), lit(0L).cast(DecimalType(28, 9)))
          + col("pr")).as("score"))
    scored.groupBy("doc_id", "lab")
      .agg(min(struct((-col("score")).as("ns"), col("c").as("p"))).as("m"))
      .groupBy(col("lab").as("lang_true"), col("m.p").as("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang_true", "lang_pred")
  }
}
