package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("separable vocabulary classifies perfectly: diagonal confusion") {
    val docs = Seq(
      (0L, "apple apple fruit", "A"), (2L, "apple fruit fruit", "A"),
      (4L, "rocket space launch", "B"), (6L, "space rocket", "B"),
      (1L, "apple fruit", "A"), (3L, "fruit apple apple", "A"),
      (5L, "launch rocket space", "B"), (7L, "space space launch", "B")
    ).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.trainEvalConfusion(docs, "doc_id", "text",
      "lang", col("doc_id") % 2 === 0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("A", "A") -> 2L, ("B", "B") -> 2L), s"$out")
  }

  test("an empty test document falls back to the prior (majority " +
      "class, smallest label on ties)") {
    val docs = Seq(
      (0L, "x x x", "A"), (2L, "x x", "A"), (4L, "y", "B"),
      (1L, "", "B") // empty test doc; prior favors A (2 docs vs 1)
    ).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.trainEvalConfusion(docs, "doc_id", "text",
      "lang", col("doc_id") % 2 === 0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("B", "A") -> 1L), s"$out")
  }

  test("fixture languages: NB beats uniform chance and the matrix " +
      "partitions the test set") {
    val docs = graft.Tables.documents(spark, SfDir)
    val cm = NaiveBayes.trainEvalConfusion(docs, "doc_id", "text",
      "lang", col("doc_id") % 2 === 0).collect()
    val total = cm.map(_.getLong(2)).sum
    val nTest = docs.filter(col("doc_id") % 2 === 1).count()
    assert(total == nTest, "every test doc appears exactly once")
    val diag = cm.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    // the fixture text is domain soup with only light language
    // flavoring — NB clears uniform chance (1/5), not much more
    assert(diag.toDouble / total > 0.25,
      s"accuracy ${diag.toDouble / total}")
  }
}
