package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DomainCurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, SfDir)

  test("shrinkage pulls every domain toward the corpus mean") {
    val prior = DomainCuration.domainQualityPrior(docs, "source", "text")
      .collect().map(r => (r.getAs[Double]("raw_mean"),
        r.getAs[Double]("shrunk_mean"))).toSeq
    assert(prior.nonEmpty)
    val grand = prior.map(_._1).sum / prior.size // ~ corpus mean
    prior.foreach { case (raw, shrunk) =>
      // shrunk lies between raw and the corpus mean (within rounding)
      assert((shrunk - raw).abs <= (grand - raw).abs + 1e-4,
        s"raw=$raw shrunk=$shrunk grand=$grand")
    }
  }

  test("temperature τ=0.5 upweights small domains; kept set respects rates") {
    val mix = DomainCuration.temperatureMixture(docs, "source",
      "doc_id", "text", budgetTokens = 5000L)
      .collect().map(r => (r.getAs[Long]("n_tokens"),
        r.getAs[Double]("rate"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_docs"))).toSeq
    assert(mix.nonEmpty)
    // rate decreases with domain size wherever unclamped (p ∝ √T ⇒
    // rate ∝ 1/√T)
    val unclamped = mix.filter(_._2 < 1.0).sortBy(_._1)
    unclamped.sliding(2).foreach {
      case Seq((t1, r1, _, _), (t2, r2, _, _)) if t1 < t2 =>
        assert(r1 >= r2 - 1e-9, s"rate must fall with size: $t1→$r1, $t2→$r2")
      case _ =>
    }
    mix.foreach { case (_, rate, kept, n) =>
      assert(kept <= n)
      assert(rate > 0.0 && rate <= 1.0)
    }
  }

  test("expected kept tokens track the budget when nothing clamps") {
    val budget = 2000L // small enough that every rate < 1
    val mix = DomainCuration.temperatureMixture(docs, "source",
      "doc_id", "text", budget)
      .collect()
    assert(mix.forall(_.getAs[Double]("rate") < 1.0))
    val expected = mix.map(r =>
      r.getAs[Double]("rate") * r.getAs[Long]("n_tokens")).sum
    assert(math.abs(expected - budget) / budget < 0.02,
      s"Σ rate·tokens = $expected should approximate the $budget budget")
  }
}
