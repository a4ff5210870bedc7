package graft.text

import graft.SparkSpec

/** Hand-computed pins for BPE training (the Sennrich et al. worked
  * example: word freqs low:5 lower:2 newest:6 widest:3) — training is an
  * iterative fixpoint, not SQL-expressible, so the spec IS the oracle. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // one word per row keeps the hand-computed frequencies exact
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).toDF("text")

  test("train learns the textbook merge sequence, ties broken lexicographically") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    // iteration-by-iteration by hand:
    //  1: (e,s)=9 ties (s,t),(t,</w>) → lexicographic min (e,s)
    //  2: (es,t)=9 beats (t,</w>) lexicographically
    //  3: (est,</w>)=9
    //  4: (l,o)=7 ties (o,w) → (l,o)
    //  5: (lo,w)=7
    assert(m.merges === Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord),
      ("l", "o"), ("lo", "w")))
  }

  test("train is deterministic and stops early when counts fall below the floor") {
    val m1 = Bpe.train(corpus, "text", numMerges = 5)
    val m2 = Bpe.train(corpus, "text", numMerges = 5)
    assert(m1.merges === m2.merges)
    // a floor of 8 stops after the three 9-count est merges: the next
    // best is (l,o) at 7 — (w,e) fell to 2 once newest became
    // n·e·w·est</w>
    val floored = Bpe.train(corpus, "text", numMerges = 10,
      minPairCount = 8L)
    assert(floored.merges ===
      Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
  }

  test("sampleRate=1.0 is exact training; a sampled train is deterministic and valid") {
    // the sampling knob must be a pure pre-filter: full rate == the
    // unsampled path, merge for merge
    val exact = Bpe.train(corpus, "text", numMerges = 5)
    val full = Bpe.train(corpus, "text", numMerges = 5, sampleRate = 1.0)
    assert(full.merges === exact.merges)
    // a real sample: deterministic across runs (content-hash decision),
    // and its merges are learnable (the fixture rows are identical per
    // word, so any surviving subset preserves relative frequencies)
    val s1 = Bpe.train(corpus, "text", numMerges = 3, minPairCount = 1L,
      sampleRate = 0.7)
    val s2 = Bpe.train(corpus, "text", numMerges = 3, minPairCount = 1L,
      sampleRate = 0.7)
    assert(s1.merges === s2.merges)
    intercept[IllegalArgumentException] {
      Bpe.train(corpus, "text", 3, sampleRate = 0.0)
    }
  }

  test("encodeWord: greedy lowest-rank-first, unseen words fall back to chars") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    assert(m.encodeWord("lowest") === Seq("low", "est" + Bpe.EndOfWord))
    assert(m.encodeWord("low") === Seq("low", Bpe.EndOfWord))
    assert(m.encodeWord("xyz") === Seq("x", "y", "z", Bpe.EndOfWord))
  }

  test("property: encode is lossless — symbols rejoin to the word, any merges") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val syms = m.encodeWord(w)
      // concatenating the symbols and dropping the end marker must give
      // the word back exactly — merges never lose or reorder characters
      assert(syms.mkString.stripSuffix(Bpe.EndOfWord) === w, w)
      assert(syms.last.endsWith(Bpe.EndOfWord), w)
    }
  }

  test("encode and tokenCount run per-partition over a text column") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    val enc = Bpe.encode(Seq((1L, "newest lowest"), (2L, ""))
      .toDF("id", "text"), "text", m)
      .orderBy("id").collect()
    assert(enc(0).getSeq[String](2) ===
      Seq("n", "e", "w", "est" + Bpe.EndOfWord, "low", "est" + Bpe.EndOfWord))
    assert(enc(1).getSeq[String](2) === Seq.empty)
    val counts = Bpe.tokenCount(Seq((1L, "newest lowest"))
      .toDF("id", "text"), "text", m)
      .collect()
    assert(counts(0).getAs[Long]("n_bpe") === 6L)
  }

  test("save/load round-trips a trained model bit-for-bit") {
    val docs = Seq("low lower lowest", "low low newer newest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 12)
    val f = java.nio.file.Files.createTempDirectory("bpe").toString +
      "/merges.txt"
    Bpe.save(model, f)
    val back = Bpe.load(f)
    assert(back.merges === model.merges)
    // and the reloaded model tokenizes identically
    Seq("lowest", "newer", "unseen").foreach { w =>
      assert(back.encodeWord(w) === model.encodeWord(w))
    }
  }
}
