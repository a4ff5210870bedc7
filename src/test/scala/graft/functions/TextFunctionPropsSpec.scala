package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated property tests for the scalar layer (SURVEY.md
  * §5), evaluated through Spark one-row frames so the properties hold
  * for the actual engine semantics. Fixed seed → deterministic. */
class TextFunctionPropsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).head().get(0)

  /** n deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val texts: Gen[String] = Gen.listOfN(12,
    Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.oneOf(" ", "\t", ",", "!",
      "<!-- image -->", "\r\n3"))).map(_.mkString(" ")).map(_.take(120))

  test("tokens: always lowercase alnum, never empty strings") {
    samples(texts, 15).foreach { s =>
      val toks = one(TextFunctions.tokens(col("t")), s)
        .asInstanceOf[scala.collection.Seq[String]]
      assert(toks.forall(t => t.nonEmpty && t.matches("[a-z0-9]+")), s"in: $s")
    }
  }

  test("shingles: count = max(0, n_tokens - 2); each has exactly 3 tokens") {
    samples(texts, 15).foreach { s =>
      val toks = one(TextFunctions.tokens(col("t")), s)
        .asInstanceOf[scala.collection.Seq[String]]
      val sh = one(TextFunctions.shingles(
        TextFunctions.tokens(col("t")), 3), s).asInstanceOf[scala.collection.Seq[String]]
      assert(sh.length === math.max(0, toks.length - 2), s"in: $s")
      assert(sh.forall(_.split(" ").length === 3), s"in: $s")
    }
  }

  test("cleanText is idempotent") {
    samples(texts, 15).foreach { s =>
      val once  = one(TextFunctions.cleanText(col("t")), s).asInstanceOf[String]
      val twice = one(TextFunctions.cleanText(lit(once)), "x").asInstanceOf[String]
      assert(twice === once, s"in: $s")
    }
  }

  test("md5Long: stable and non-negative") {
    samples(texts, 10).foreach { s =>
      val a = one(TextFunctions.md5Long(col("t")), s).asInstanceOf[Long]
      val b = one(TextFunctions.md5Long(col("t")), s).asInstanceOf[Long]
      assert(a === b)
      assert(a >= 0)
    }
  }

  test("parseVectorString round-trips integer-component vectors") {
    val vecs = Gen.listOfN(8, Gen.choose(-1000000, 1000000))
    samples(vecs, 10).foreach { v =>
      val s = v.mkString("{", ",", "}")
      val parsed = one(VectorFunctions.parseVectorString(col("t")), s)
        .asInstanceOf[scala.collection.Seq[Float]]
      assert(parsed === v.map(_.toFloat), s"in: $s")
    }
  }

  test("native ShinglesExpr ≡ HOF shingles on arbitrary token arrays") {
    // the native expression claims byte-identity with the HOF
    // formulation it replaced — hold it to that on generated inputs
    val hof: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      toks => filter(
        transform(sequence(lit(1), greatest(size(toks) - 2, lit(0))),
          i => concat_ws(" ",
            element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2))),
        s => s =!= "" || lit(true)) // identity filter, keeps types aligned
    samples(texts, 15).foreach { s =>
      val native = one(TextFunctions.shingles(
        TextFunctions.tokens(col("t")), 3), s)
        .asInstanceOf[scala.collection.Seq[String]]
      val viaHof = one(hof(TextFunctions.tokens(col("t"))), s)
        .asInstanceOf[scala.collection.Seq[String]]
      assert(native === viaHof, s"in: $s")
    }
  }

  test("native SimHashExpr ≡ per-bit HOF majority vote") {
    samples(texts, 10).foreach { s =>
      val hashes = TextFunctions.tokens(col("t"))
      val hs = transform(hashes, t => TextFunctions.md5Long(t))
      val native = one(
        org.apache.spark.sql.graftext.SimHashExpr.simhash(hs, 12), s)
        .asInstanceOf[Long]
      val toks = one(hs, s).asInstanceOf[scala.collection.Seq[Long]]
      val expected = (0 until 12).map { i =>
        val vote = toks.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) 1L << i else 0L
      }.sum
      assert(native === expected, s"in: $s")
    }
  }

  test("categoryLevel never throws on arbitrary paths, '' when absent") {
    val paths = Gen.listOf(Gen.oneOf("a", "b\\c", "", "d/e"))
      .map(_.mkString("/"))
    samples(paths, 10).foreach { p =>
      (1 to 4).foreach { lvl =>
        val r = one(TextFunctions.categoryLevel(lit(p), lvl), "x")
        assert(r.isInstanceOf[String], s"in: $p lvl $lvl")
      }
    }
  }

  test("chunkTokens: every token covered; adjacent chunks share `overlap` tokens") {
    val sizes = Gen.zip(Gen.choose(2, 8), Gen.choose(0, 3))
      .suchThat { case (sz, ov) => ov < sz }
    samples(Gen.zip(texts, sizes), 15).foreach { case (s, (sz, ov)) =>
      val toks = one(TextFunctions.tokens(col("t")), s)
        .asInstanceOf[scala.collection.Seq[String]]
      val chunks = one(TextFunctions.chunkTokens(
        TextFunctions.tokens(col("t")), sz, ov), s)
        .asInstanceOf[scala.collection.Seq[String]]
      // coverage: concatenation of step-prefixes reconstructs the doc
      val step = sz - ov
      val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
        val ts = if (c.isEmpty) Seq.empty else c.split(" ").toSeq
        if (i == chunks.length - 1) ts else ts.take(step)
      }
      assert(rebuilt === toks, s"in: $s size=$sz overlap=$ov")
      // overlap: consecutive chunks share exactly the overlap suffix/prefix
      chunks.sliding(2).foreach {
        case scala.collection.Seq(a, b) =>
          val at = a.split(" ").toSeq
          if (at.length == sz) { // a full chunk overlaps into the next
            assert(at.drop(step) === b.split(" ").toSeq.take(ov),
              s"in: $s size=$sz overlap=$ov")
          }
        case _ =>
      }
    }
  }

  test("zInterleave is a bijection on the sampled grid (no code collisions)") {
    val pts = for {
      a <- Gen.choose(0L, 1000L); b <- Gen.choose(0L, 1000L)
    } yield (a, b)
    val ps = samples(pts, 40).distinct
    val codes = ps.toDF("a", "b")
      .select(graft.table.DataLayout.zInterleave(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(codes.distinct.length === ps.length)
  }

  test("topk_freq counts are exact under any partitioning when capacity suffices") {
    val words = Gen.listOfN(60, Gen.oneOf("a", "b", "c", "d", "e"))
    samples(words, 5).zipWithIndex.foreach { case (ws, i) =>
      val df = ws.zipWithIndex.map { case (w, j) => ("g", w) }
        .toDF("g", "v").repartition(3 + i) // vary merge topology
      val got = graft.functions.Sketches.topKFrequent(df, "g", "v", 8, 5)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      val exact = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got === exact, s"sample $i")
    }
  }
}
