package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("r")).head().get(0)

  test("langId: picks language by stopword ratio; und when no hits") {
    assert(one(TextAnalysis.langId(col("text")),
      "the cat is on the mat and it is happy") === "en")
    assert(one(TextAnalysis.langId(col("text")),
      "le chat est sur le tapis et il est content") === "fr")
    assert(one(TextAnalysis.langId(col("text")), "zzz qqq www") === "und")
    assert(one(TextAnalysis.langId(col("text")), "") === "und")
  }

  test("qualityScore in [0,1]; clean prose beats garbage") {
    val good = one(TextAnalysis.qualityScore(col("text")),
      "This is a reasonably long, well formed sentence with normal words " +
        "and a sensible amount of punctuation. It continues for a while " +
        "so that the length criterion is satisfied too.").asInstanceOf[Double]
    val bad = one(TextAnalysis.qualityScore(col("text")),
      "!!! ??? ,,, ;;; ### @@@").asInstanceOf[Double]
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
    assert(one(TextAnalysis.qualityScore(col("text")), "")
      .asInstanceOf[Double] === 0.0)
  }

  test("fingerprint: stable; equal for equal normalized text; short-doc fallback") {
    val a = one(TextAnalysis.fingerprint(col("text")), "hello   world\tfoo")
    val b = one(TextAnalysis.fingerprint(col("text")), "hello world foo")
    assert(a === b) // whitespace-normalized
    val s = one(TextAnalysis.fingerprint(col("text")), "hi")
    assert(s.isInstanceOf[Long])
  }

  test("profile emits all five stats columns") {
    val df = Seq((1L, "The quick brown fox."), (2L, ""))
      .toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "doc_id", "text")
    assert(p.columns.toSeq ===
      Seq("doc_id", "n_tokens", "n_bpeish", "lang_id", "quality", "fp"))
    assert(p.count() === 2)
  }
}
