package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.text.TextAnalysis

class TrainingCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TrainingCorpus.Config(
    minQuality = 0.5, tokensPerLang = 4000L,
    mixture = Map("en" -> 30, "ko" -> 8, "de" -> 12, "fr" -> 6, "es" -> 20),
    benchmarkPhrases = Seq("table scan merge part"))

  test("pipeline output honors every stage's invariant") {
    val docs = Tables.documents(spark, SfDir)
    val out = TrainingCorpus.build(docs, "doc_id", "text", "lang", cfg)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0)).toSet

    val joined = docs.filter(col("doc_id").isInCollection(ids.toSeq))
    // no duplicate content survived
    assert(joined.select(md5(col("text"))).distinct().count() === ids.size)
    // quality floor respected
    val minQ = joined.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q")).head().getDouble(0)
    assert(minQ >= cfg.minQuality)
    // mixture quotas respected per language, absent langs dropped
    val byLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    byLang.foreach { case (l, n) =>
      assert(cfg.mixture.contains(l), s"lang $l not in recipe but present")
      assert(n <= cfg.mixture(l), s"lang $l over quota: $n")
    }
    // token budget respected per language
    rows.groupBy(_.getString(1)).foreach { case (l, rs) =>
      assert(rs.map(_.getLong(2)).sum <= cfg.tokensPerLang,
        s"lang $l over token budget")
    }
  }

  test("contaminated and near-dup docs are excluded") {
    // plant a contaminated doc and an exact dup; neither may survive
    val docs = Tables.documents(spark, SfDir).filter(col("doc_id") <= 50)
      .union(Seq(
        (9001L, "prefix table scan merge part suffix padding words here",
          "en", "srcX", 50L),
        (9002L, Tables.documents(spark, SfDir)
          .filter(col("doc_id") === 1L).select("text")
          .head().getString(0), "en", "srcX", 50L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = TrainingCorpus.build(docs, "doc_id", "text", "lang", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(!out.contains(9001L), "contaminated doc admitted")
    assert(!out.contains(9002L), "exact dup with higher id admitted")
  }
}
