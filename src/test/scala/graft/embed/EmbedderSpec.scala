package graft.embed

import graft.SparkSpec

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val e = DeterministicEmbedder(64)

  test("deterministic across calls and instances") {
    val a = e.embed("spark join merge")
    val b = DeterministicEmbedder(64).embed("spark join merge")
    assert(a.toSeq === b.toSeq)
  }

  test("unit norm for non-empty text; zero vector for empty") {
    val v = e.embed("hello world")
    val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(n - 1.0) < 1e-6)
    assert(e.embed("").forall(_ == 0f))
    assert(e.embed("").length === 64)
  }

  test("token overlap raises cosine similarity") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d  = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    val q    = e.embed("spark join merge sort window")
    val near = e.embed("spark join merge sort table")
    val far  = e.embed("completely unrelated words entirely")
    assert(cos(q, near) > cos(q, far))
  }

  test("BatchEmbed appends array<float> column, preserves rows") {
    val df  = Seq((1L, "alpha beta"), (2L, ""), (3L, "gamma")).toDF("id", "text")
    val out = BatchEmbed.withEmbedding(df, "text", "emb", e)
    assert(out.schema("emb").dataType.typeName === "array")
    val rows = out.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getSeq[Float](2) === e.embed("alpha beta").toSeq)
    assert(rows(1).getSeq[Float](2).forall(_ == 0f))
  }

  test("null text embeds as empty text (fail-soft, reference status=fail rows)") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r  = BatchEmbed.withEmbedding(df, "text", "emb", e).head()
    assert(r.getSeq[Float](2).forall(_ == 0f))
  }
}
