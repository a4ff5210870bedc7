package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class KeywordsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, SfDir)

  test("emits at most k ranked terms per tagged doc, scores descending") {
    val out = Keywords.topTfidfTerms(docs, "doc_id", "text", 3,
      forDocs = col("doc_id") < 10).cache()
    assert(out.filter(col("rk") > 3).count() === 0)
    assert(out.select("doc_id").distinct().count() === 10)
    val bad = out.as("x").join(out.as("y"),
        col("x.doc_id") === col("y.doc_id") &&
        col("x.rk") === col("y.rk") - 1)
      .filter(col("x.score") < col("y.score"))
    assert(bad.count() === 0, "scores must not increase with rank")
  }

  test("document frequency is corpus-wide even when tagging a subset") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple durian")).toDF("doc_id", "text")
    val out = Keywords.topTfidfTerms(tiny, "doc_id", "text", 2,
      forDocs = col("doc_id") === 1)
      .collect().map(r => (r.getAs[String]("term"),
        r.getAs[Double]("score"))).toMap
    // 'apple' appears in all 3 docs (df=3) though only doc 1 is tagged;
    // idf = ln(4/4)+1 = 1 → score exactly tf = 1
    assert(out("apple") === 1.0)
    // 'banana': tf=2, df=1 → 2*(ln(2)+1)
    assert(math.abs(out("banana") -
      math.rint(2 * (math.log(2.0) + 1) * 1e6) / 1e6) < 1e-9)
  }
}
