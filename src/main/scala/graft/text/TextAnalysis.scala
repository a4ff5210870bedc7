package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen'd, shuffle-free per-row) with exact DuckDB
  * oracle equivalents.
  */
object TextAnalysis {

  /** Per-language stopword marker sets for the n-gram/stopword-ratio
    * language heuristic. Tiny on purpose: the id is argmax of marker-hit
    * ratio, deterministic tie-break by language code order. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "un", "une"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men"))

  /** Stopword-hit ratio for one language: |tokens ∩ markers| / |tokens|
    * (distinct-token semantics, matching `array_intersect`). */
  def langScore(toks: Column, markers: Seq[String]): Column =
    when(size(toks) === 0, 0.0).otherwise(
      size(array_intersect(toks, typedLit(markers))).cast("double") /
        size(array_distinct(toks)).cast("double"))

  /** Argmax language with deterministic tie-break (first in code order
    * wins); "und" (undetermined) when no marker hits at all.
    * Tokens and the score vector are let-bound (TextFunctions.bind) so
    * the regex split runs once per row, not once per CASE arm. */
  def langId(textCol: Column): Column =
    TextFunctions.bind(TextFunctions.tokens(textCol), toks =>
      TextFunctions.bind(
        array(Stopwords.map { case (_, mk) => langScore(toks, mk) }: _*),
        ss => {
          val best = array_max(ss)
          Stopwords.map(_._1).zipWithIndex
            .foldLeft(when(best <= 0.0, lit("und"))) {
              case (acc, (lang, i)) =>
                acc.when(element_at(ss, i + 1) === best, lit(lang))
            }.otherwise(lit("und"))
        }))

  /** Heuristic quality score in [0,1]: weighted mix of length fitness,
    * alphanumeric density, punctuation restraint and mean word length
    * fitness. Deterministic, documented, and reproduced verbatim in the
    * DuckDB oracle (SparkEntry.oracleSql). */
  def qualityScore(textCol: Column): Column =
    TextFunctions.bind(
      array(length(textCol).cast("double"),
        length(regexp_replace(textCol, "[^A-Za-z0-9]", "")).cast("double"),
        length(regexp_replace(textCol, "[^.,;:!?]", "")).cast("double"),
        TextFunctions.tokenCount(textCol).cast("double")),
      m => {
        val len      = element_at(m, 1)
        val alnum    = element_at(m, 2)
        val punct    = element_at(m, 3)
        val nTok     = element_at(m, 4)
        val lenFit   = least(len / 200.0, lit(1.0))             // reward ≥200 chars
        val alnumR   = when(len === 0, 0.0).otherwise(alnum / len)
        val punctOk  = when(len === 0, 0.0)
          .otherwise(lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0)))
        val meanWl   = when(nTok === 0, 0.0).otherwise(alnum / nTok)
        val wlFit    = lit(1.0) - least(abs(meanWl - 5.0) / 5.0, lit(1.0))
        round(lit(0.25) * lenFit + lit(0.25) * alnumR +
          lit(0.25) * punctOk + lit(0.25) * wlFit, 6)
      })

  /** Rolling-hash document fingerprint: minimum 60-bit md5 hash over
    * 8-char sliding windows of the normalized text (MinHash-of-char-
    * shingles; robust to word reordering at the edges, cheap to compare).
    * Docs shorter than 8 chars fall back to the hash of the whole text. */
  def fingerprint(textCol: Column): Column =
    TextFunctions.bind(lower(regexp_replace(textCol, "\\s+", " ")), norm =>
      when(length(norm) < 8, TextFunctions.md5Long(norm))
        .otherwise(array_min(transform(sequence(lit(1), length(norm) - 7),
          i => TextFunctions.md5Long(norm.substr(i, lit(8)))))))

  /** Full per-document stats relation: the one-pass profile a pipeline
    * computes before filtering (tokens, bpe-ish tokens, lang, quality,
    * fingerprint). */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.bpeishTokenCount(col(textCol)).as("n_bpeish"),
      langId(col(textCol)).as("lang_id"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fp"))
}
