package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FertilitySpec extends SparkSpec {
  import spark.implicits._

  test("fertility and compression ratios are exact truncated ppm") {
    val docs = Seq(
      (1L, "en", "hello world"),          // 2 words, 2 subwords, 11 chars
      (2L, "en", "it's a test-case"),     // 3 words, 6 subwords + punct
      (3L, "de", "straße und haus")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenizerFertility(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") == 2)
    assert(en.getAs[Long]("n_words") == 5)
    // "it's a test-case": runs [it, s, a, test, case] = 5 + 2 punct = 7
    // plus hello/world = 2 → 9 subwords
    assert(en.getAs[Long]("n_subwords") == 9)
    assert(en.getAs[Double]("fertility") ==
      (9L * 1000000L / 5L).toDouble / 1e6)
    val chars = en.getAs[Long]("n_chars")
    assert(en.getAs[Double]("chars_per_token") ==
      (chars * 1000000L / 9L).toDouble / 1e6)
  }

  test("higher-fertility scripts rank above plain ascii") {
    // hyphen/apostrophe-dense text fragments into more subwords/word
    val docs = Seq(
      (1L, "frag", "l'état c'est-à-dire qu'on n'est"),
      (2L, "plain", "simple words flow easily here now")).toDF(
      "doc_id", "lang", "text")
    val out = TextAnalysis.tokenizerFertility(docs, "text", "lang")
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("fertility")).toMap
    assert(out("frag") > out("plain"),
      s"fragmenting text must show higher fertility: $out")
  }
}
