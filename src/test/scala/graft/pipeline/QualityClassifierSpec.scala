package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("features: hand-checked components") {
    val f = Seq("The cat is on the mat.").toDF("text")
      .select(QualityClassifier.features(col("text")).as("f"))
      .head().getSeq[Double](0)
    // len 22; alnum "Thecatisonthemat" = 16; punct "." = 1;
    // toks [the,cat,is,on,the,mat] n=6, distinct 5, en-marker hits
    // {the,is} = 2
    assert(math.abs(f(0) - math.log(23.0)) < 1e-9)
    assert(math.abs(f(1) - 16.0 / 22.0) < 1e-9)
    assert(math.abs(f(2) - 1.0 / 6.0) < 1e-9)
    assert(math.abs(f(3) - 16.0 / 6.0) < 1e-9)
    assert(math.abs(f(4) - 2.0 / 5.0) < 1e-9)
    // empty text: every guarded ratio is 0, not NaN/error
    val z = Seq("").toDF("text")
      .select(QualityClassifier.features(col("text")).as("f"))
      .head().getSeq[Double](0)
    assert(z(1) === 0.0 && z(3) === 0.0 && z(4) === 0.0)
  }

  test("train separates prose from punctuation soup; score applies the frozen model") {
    val clean = (1 to 30).map(i =>
      (i.toLong, s"the quick brown fox $i jumps over the lazy dog and it is fine.", 1))
    val junk = (31 to 60).map(i =>
      (i.toLong, s"$i !!;; ??%% ;;!! ,,,, ::: !?!? ;;;; $i", 0))
    val docs = (clean ++ junk).toDF("doc_id", "text", "label")
    val (w, b) = QualityClassifier.train(docs, "text", "label")
    assert(w.length === QualityClassifier.NumFeatures)
    val scored = QualityClassifier.score(docs, "doc_id", "text", w.toSeq, b)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    // the trained model separates the two classes on the training set
    val acc = docs.collect().map { r =>
      val want = r.getInt(2) == 1
      if (scored(r.getLong(0))._2 == want) 1 else 0
    }.sum / 60.0
    assert(acc >= 0.95, s"train accuracy $acc below 0.95")
    // frozen-model scoring is exactly sigmoid(b + w.f), recomputed
    // driver-side from the same feature expression
    val feats = docs.select(col("doc_id"),
        QualityClassifier.features(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Seq(1L, 31L, 60L).foreach { id =>
      val z = b + w.zip(feats(id)).map { case (wi, fi) => wi * fi }.sum
      val p = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(scored(id)._1 - p) < 1e-5, s"doc $id")
    }
  }

  test("score: threshold splits on the rounded probability; weight-arity guarded") {
    val docs = Seq((1L, "the a of and is to in it")).toDF("doc_id", "text")
    val hi = QualityClassifier.score(docs, "doc_id", "text",
      Seq(0.0, 0.0, 0.0, 0.0, 5.0), 0.0).head()
    assert(hi.getBoolean(2)) // pure stopword text, positive weight: keep
    val lo = QualityClassifier.score(docs, "doc_id", "text",
      Seq(0.0, 0.0, 0.0, 0.0, -5.0), 0.0).head()
    assert(!lo.getBoolean(2))
    intercept[IllegalArgumentException] {
      QualityClassifier.score(docs, "doc_id", "text", Seq(1.0), 0.0)
    }
  }

  test("uncertaintySample: per-source cap holds, output is ordered " +
      "by rounded uncertainty with id tiebreak, and the batch is " +
      "deterministic under repartitioning") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, SfDir)
    val w = Seq(0.05, 1.2, -0.8, 0.15, 2.0)
    val out = QualityClassifier.uncertaintySample(docs, "doc_id",
      "text", "source", w, -2.5, perSourceCap = 2, k = 6).collect()
    assert(out.length == 6)
    val bySource = out.groupBy(_.getString(1)).values.map(_.size)
    assert(bySource.forall(_ <= 2), s"cap violated: ${out.toSeq}")
    val keys = out.map(r => (r.getDouble(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, s"not ordered: $keys")
    val again = QualityClassifier.uncertaintySample(
      docs.repartition(7), "doc_id", "text", "source", w, -2.5, 2, 6)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(_.toSeq).toSeq)
  }
}
