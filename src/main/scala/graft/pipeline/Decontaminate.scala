package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — the training-data hygiene step: flag
  * documents sharing word n-gram shingles with a benchmark/eval set so
  * they can be dropped before training (the standard n-gram-overlap
  * decontamination used for public eval suites).
  *
  * Scale shape: the benchmark side (test sets — thousands of shingles,
  * not corpus-scale) becomes a broadcast relation; the corpus explodes
  * its distinct shingles once and hash-joins against it — one shuffle
  * for the per-doc count, corpus scanned once. At 100 TB the benchmark
  * side stays broadcast-size by construction.
  */
object Decontaminate {

  /** Distinct n-gram shingles of each phrase, driver-side, with the same
    * tokenize+shingle definition the corpus side uses. */
  def phraseShingles(phrases: Seq[String], n: Int = 3): Seq[String] =
    phrases.flatMap { p =>
      val toks = p.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(n).filter(_.length == n).map(_.mkString(" "))
    }.distinct

  /** Docs sharing at least one shingle with the benchmark phrases:
    * (doc_id, n_contaminated) — the count of DISTINCT shingles hit.
    * Clean docs are absent (drop = anti-join on this result). */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bench = phraseShingles(phrases, n).toDF("shingle")
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.shingles(
          TextFunctions.tokens(col(textCol)), n))).as("shingle"))
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** The keep-side: `docs` minus contaminated ones (left-anti). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], n: Int = 3): DataFrame =
    docs.join(
      contaminated(docs, idCol, textCol, phrases, n)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** GRADED contamination — the overlap FRACTION, not just a hit flag:
    * per document, its distinct-shingle count, how many of those appear
    * in the benchmark set, and the ratio. Decision-grade output for
    * threshold policies ("drop ≥ 0.05 overlap, audit ≥ 0.01") where
    * [[contaminated]]'s any-hit semantics is too blunt. Every doc gets
    * a row (clean ⇒ 0.0).
    *
    * Scale shape: ONE scan, ZERO shuffles — the benchmark shingles ride
    * along as an array literal (broadcast-sized by construction: eval
    * sets, not corpora) and the per-row work is a hash-set
    * `array_intersect`. Strictly better than the explode+join shape
    * when only counts are needed. */
  def contaminationScore(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], n: Int = 3): DataFrame = {
    val benchArr = typedLit(phraseShingles(phrases, n))
    docs.select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.shingles(
          TextFunctions.tokens(col(textCol)), n)).as("__sh"))
      .select(col("doc_id"),
        size(col("__sh")).cast("long").as("n_shingles"),
        size(array_intersect(col("__sh"), benchArr)).cast("long")
          .as("n_hit"))
      .withColumn("contamination",
        round(when(col("n_shingles") === 0, 0.0)
          .otherwise(col("n_hit").cast("double") /
            col("n_shingles").cast("double")), 6))
  }
}
