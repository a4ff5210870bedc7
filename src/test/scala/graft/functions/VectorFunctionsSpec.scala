package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  private def calc(a: Seq[Float], b: Seq[Float],
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("r"))
      .head().getDouble(0)

  test("dot / l2Norm / cosine on known vectors") {
    assert(math.abs(calc(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f),
      VectorFunctions.dot) - 32.0) < eps)
    val n = Seq(Seq(3f, 4f)).toDF("a")
      .select(VectorFunctions.l2Norm(col("a"))).head().getDouble(0)
    assert(math.abs(n - 5.0) < eps)
    assert(math.abs(calc(Seq(1f, 0f), Seq(0f, 1f), VectorFunctions.cosine)) < eps)
    assert(math.abs(calc(Seq(1f, 1f), Seq(1f, 1f),
      VectorFunctions.cosine) - 1.0) < eps)
    // zero vector → 0.0, not NaN
    assert(calc(Seq(0f, 0f), Seq(1f, 1f), VectorFunctions.cosine) === 0.0)
  }

  test("native cosine expression is bit-identical to the HOF formulation") {
    val e = graft.embed.DeterministicEmbedder(64)
    val pairs = (1 to 50).map(i =>
      (e.embed(s"doc $i topic ${i % 5}").toSeq, e.embed(s"query ${i % 3}").toSeq))
    val df = pairs.toDF("a", "b")
    val both = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fast"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("hof")).collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1))) // exact ==
    // codegen path actually exercised on a real scan (a local literal
    // relation short-circuits to LocalTableScan with no codegen stage)
    val emb = graft.Tables.embeddings(spark, SfDir)
    val scored = emb.select(VectorFunctions.cosine(col("embedding"),
      typedLit(e.embed("q").toSeq)))
    scored.collect() // finalize the adaptive plan before inspecting it
    // "*(n)" prefix marks whole-stage-codegen stages in the plan string;
    // the project computing the cosine must be inside one
    assert(scored.queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("*(") && l.contains("Project")))
  }

  test("sqDist") {
    assert(math.abs(calc(Seq(1f, 2f), Seq(4f, 6f),
      VectorFunctions.sqDist) - 25.0) < eps)
  }

  test("parseVectorString: reference TEXT-stored vectors round-trip (F10)") {
    def p(s: String): Any = Seq(s).toDF("t")
      .select(VectorFunctions.parseVectorString(col("t")).as("r")).head().get(0)
    assert(p("{-0.07,0.12,3.5}") === Seq(-0.07f, 0.12f, 3.5f))
    assert(p("[1.0, 2.0]") === Seq(1f, 2f))
    assert(p("") === Seq.empty)
  }

  test("hasDim guard (reference dims==1024 check)") {
    val df = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("v")
    assert(df.filter(VectorFunctions.hasDim(col("v"), 2)).count() === 1L)
  }

  test("lshSignature expression matches driver-side querySignature") {
    val vecs = Seq(
      Array(0.5f, -0.25f, 1f, 0.1f) ++ Array.fill(60)(0.01f),
      Array.fill(64)(-0.3f),
      Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f))
    val df = vecs.map(_.toSeq).toDF("v")
    val got = df.select(
      VectorFunctions.lshSignature(col("v"), 64, 8).as("sig"))
      .collect().map(_.getLong(0))
    val want = vecs.map(v =>
      graft.search.VectorSearch.querySignature(v, 64, 8))
    assert(got.toSeq === want)
  }

  test("centroids: exact means per group, partition-order-free") {
    import spark.implicits._
    val vecs = Seq(
      (1, Seq(1.0f, 0.0f, 2.0f)),
      (1, Seq(3.0f, 0.0f, 4.0f)),
      (2, Seq(5.0f, 5.0f, 5.0f))
    ).toDF("label", "embedding")
    val c = VectorFunctions.centroids(vecs, "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getSeq[Double](1).toSeq, r.getLong(2))).toMap
    assert(c(1) === (Seq(2.0, 0.0, 3.0), 2L))
    assert(c(2) === (Seq(5.0, 5.0, 5.0), 1L))
    // repartitioning must not change a single component (decimal sums)
    val c7 = VectorFunctions.centroids(vecs.repartition(7),
      "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(c7 === c.view.mapValues(_._1).toMap)
  }

  test("hyperplanes are deterministic and in [-1, 1]") {
    val p1 = Hyperplanes.planes(64, 8, 42L)
    val p2 = Hyperplanes.planes(64, 8, 42L)
    assert(p1.map(_.toSeq).toSeq === p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(x => x >= -1.0 && x <= 1.0))
    assert(Hyperplanes.planes(64, 8, 7L).map(_.toSeq).toSeq !=
      p1.map(_.toSeq).toSeq)
  }
}
