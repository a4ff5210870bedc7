package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("r")).head().get(0)

  test("langId: picks language by stopword ratio; und when no hits") {
    assert(one(TextAnalysis.langId(col("text")),
      "the cat is on the mat and it is happy") === "en")
    assert(one(TextAnalysis.langId(col("text")),
      "le chat est sur le tapis et il est content") === "fr")
    assert(one(TextAnalysis.langId(col("text")), "zzz qqq www") === "und")
    assert(one(TextAnalysis.langId(col("text")), "") === "und")
  }

  test("qualityScore in [0,1]; clean prose beats garbage") {
    val good = one(TextAnalysis.qualityScore(col("text")),
      "This is a reasonably long, well formed sentence with normal words " +
        "and a sensible amount of punctuation. It continues for a while " +
        "so that the length criterion is satisfied too.").asInstanceOf[Double]
    val bad = one(TextAnalysis.qualityScore(col("text")),
      "!!! ??? ,,, ;;; ### @@@").asInstanceOf[Double]
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
    assert(one(TextAnalysis.qualityScore(col("text")), "")
      .asInstanceOf[Double] === 0.0)
  }

  test("fingerprint: stable; equal for equal normalized text; short-doc fallback") {
    val a = one(TextAnalysis.fingerprint(col("text")), "hello   world\tfoo")
    val b = one(TextAnalysis.fingerprint(col("text")), "hello world foo")
    assert(a === b) // whitespace-normalized
    val s = one(TextAnalysis.fingerprint(col("text")), "hi")
    assert(s.isInstanceOf[Long])
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 substring share a fingerprint") {
    def fps(t: String): Set[Long] =
      Seq(t).toDF("text")
        .select(TextAnalysis.winnowFingerprints(col("text")).as("f"))
        .head().getSeq[Long](0).toSet
    // w + k - 1 = 11: an 11-char shared run must collide
    val shared = "abcdefghijk"
    val a = fps(s"xxxx $shared yyyy")
    val b = fps(s"qqqqqqq $shared zzzzz")
    assert(a.intersect(b).nonEmpty)
    // unrelated strings of the same alphabet need not (and here do not)
    val c = fps("totally different content with no overlap at all")
    assert(a.intersect(c).isEmpty)
    // density: can't select more fingerprints than windows; always >= 1
    val t = "the quick brown fox jumps over the lazy dog"
    val n = fps(t).size
    assert(n >= 1 && n <= t.length - 8 + 1)
    // short-doc fallbacks: < k chars hashes whole text; < w windows one min
    assert(fps("hi").size === 1)
    assert(fps("abcdefghi").size === 1)
  }

  test("native winnow expression ≡ HOF formulation, element for element") {
    val rnd = new scala.util.Random(7)
    val texts = Seq("", "hi", "abcdefg", "abcdefgh", "abcdefghi",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa") ++
      (1 to 50).map(_ => (1 to rnd.nextInt(120))
        .map(_ => " abcdefgh".charAt(rnd.nextInt(9))).mkString)
    for ((kk, ww) <- Seq((8, 4), (16, 8), (3, 2))) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").filter(length(col("text")) > 0)
      val both = df.select(
          TextAnalysis.winnowFingerprints(col("text"), kk, ww).as("native"),
          TextAnalysis.winnowFingerprintsHof(col("text"), kk, ww).as("hof"))
        .collect()
      both.foreach(r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$kk w=$ww"))
    }
  }

  test("charEntropy: 0 for uniform char, ln(2) for ab, ln(n) for n distinct") {
    def h(t: String): Double =
      one(TextAnalysis.charEntropy(col("text")), t).asInstanceOf[Double]
    assert(h("aaaa") === 0.0)
    assert(math.abs(h("ab") - math.log(2)) < 1e-6)
    assert(math.abs(h("abcd") - math.log(4)) < 1e-6)
    assert(h("") === 0.0)
    // repetitive text scores strictly below varied text of the same length
    assert(h("abababababab") < h("abcdefghijkl"))
  }

  test("pmiPairs: hand-checked counts and PMI on a tiny corpus") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta gamma"),
      (4L, "alpha delta"), (5L, "gamma delta")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiPairs(docs, "doc_id", "text", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // alpha in 4 docs, beta in 3, together in 3 of N=5:
    // pmi = ln(3*5 / (4*3)) = ln(1.25)
    assert(got.keySet === Set(("alpha", "beta")))
    val (cab, pmi) = got(("alpha", "beta"))
    assert(cab === 3L)
    assert(math.abs(pmi - math.log(1.25)) < 1e-6)
    // pairs below minPairCount are dropped, and a >= b never appears
    val all = TextAnalysis.pmiPairs(docs, "doc_id", "text", 1L).collect()
    assert(all.forall(r => r.getString(0) < r.getString(1)))
    assert(all.length === 5) // ab, ad, ag, bg, dg and NOT bd (0 docs)
  }

  test("bigramPerplexity: hand-checked interpolated LM on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b b"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexity(docs, "doc_id", "text", 0.75)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // unigrams: a=3, b=3, N=6; bigrams: (a,b)=1,(b,a)=1,(b,b)=1;
    // contexts: a=1, b=2
    // p(b|a) = .75*1/1 + .25*3/6 = .875 ; p(a|b) = p(b|b) = .5
    val avg1 = (math.log(0.875) + math.log(0.5)) / 2.0
    assert(got.keySet === Set(1L, 2L)) // 1-token doc 3 has no events
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - avg1) < 1e-6)
    assert(math.abs(got(1L)._3 - math.exp(-avg1)) < 1e-6)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(2L)._3 - 2.0) < 1e-6) // ppl = 1/p(b|b) = 2
    // a document that reads like the corpus scores lower ppl than a doc
    // made of transitions the LM never saw together dominating rarity
    val big = (1L to 20L).map(i => (i, "x y x y x y")) :+ (99L, "y q x z")
    val scored = TextAnalysis.bigramPerplexity(
      big.toDF("doc_id", "text"), "doc_id", "text", 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) < scored(99L))
  }

  test("zipfSlope: exact -1 on a synthetic 1/rank corpus") {
    // freq(term_r) = 12/r for r in 1..4 → ln freq = ln 12 - ln rank:
    // slope exactly -1 (up to float), fit over n_terms = 4
    val words = (1 to 4).flatMap(r => Seq.fill(12 / r)(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.zipfSlope(docs, "doc_id", "text").head()
    assert(row.getLong(0) === 4L)
    assert(math.abs(row.getDouble(1) - (-1.0)) < 1e-6)
  }

  test("profile emits all five stats columns") {
    val df = Seq((1L, "The quick brown fox."), (2L, ""))
      .toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "doc_id", "text")
    assert(p.columns.toSeq ===
      Seq("doc_id", "n_tokens", "n_bpeish", "lang_id", "quality", "fp"))
    assert(p.count() === 2)
  }

  test("gopher rules: long stopworded doc passes, short doc fails words rule") {
    val good = ("the data " * 30).trim        // 60 words, 2 stopword types? "the" only
    val goodWithStops = s"$good and that have with be to of"
    val short = "tiny doc of the and"          // 5 words
    val df = Seq((1L, goodWithStops), (2L, short)).toDF("doc_id", "text")
    val m = TextAnalysis.gopherMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = m(1L)
    assert(g.getAs[Long]("n_words") === 67L)
    assert(g.getAs[Int]("pass_words") === 1)
    assert(g.getAs[Int]("pass_stop") === 1)
    assert(g.getAs[Int]("pass_alpha") === 1)
    assert(g.getAs[Int]("pass_gopher") === g.getAs[Int]("pass_word_len"))
    val s = m(2L)
    assert(s.getAs[Int]("pass_words") === 0)
    assert(s.getAs[Int]("pass_gopher") === 0)
    assert(s.getAs[Long]("n_stop") === 3L) // of, the, and
  }

  test("gopher rules: mean word length and alpha fraction boundaries") {
    // 50 one-char words -> mean_word_len 1.0 (fail), all alpha
    val ones = (1 to 50).map(_ => "a").mkString(" ")
    // 50 numeric words -> alpha_frac 0.0 (fail)
    val nums = (1 to 50).map(i => "12345").mkString(" ")
    val df = Seq((1L, ones), (2L, nums)).toDF("doc_id", "text")
    val m = TextAnalysis.gopherMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("mean_word_len") === 1.0)
    assert(m(1L).getAs[Int]("pass_word_len") === 0)
    assert(m(2L).getAs[Double]("alpha_frac") === 0.0)
    assert(m(2L).getAs[Int]("pass_alpha") === 0)
    assert(m(2L).getAs[Int]("pass_words") === 1)
  }

  test("textRank: mass conserved, hub outranks leaf, deterministic") {
    // star graph: "hub" co-occurs with every leaf; leaves only with hub
    val docs = (1 to 6).map(i => (i.toLong, s"hub leaf$i hub")).toDF("doc_id", "text")
    val pr = TextAnalysis.textRank(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.size === 7)
    // total PageRank mass stays ~1 (rounding loses < 1e-5)
    assert(math.abs(pr.values.sum - 1.0) < 1e-4, s"mass ${pr.values.sum}")
    val hub = pr("hub")
    (1 to 6).foreach(i => assert(hub > pr(s"leaf$i"),
      s"hub $hub vs leaf$i ${pr(s"leaf$i")}"))
    val again = TextAnalysis.textRank(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again === pr)
  }

  test("llrBigrams: G2 matches the hand-built 2x2 contingency and " +
      "adjacency (not mere co-occurrence) defines a bigram") {
    // corpus of 12 bigram tokens: "new york" appears 3x adjacent;
    // "cold war" words co-occur in one doc but never adjacently
    val docs = Seq(
      "new york is big", "new york wins", "in new york",
      "the war was cold").toDF("text")
    val out = TextAnalysis.llrBigrams(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    assert(out.contains(("new", "york")))
    assert(!out.contains(("cold", "war")) && !out.contains(("war", "cold")))
    val (c12, g2) = out(("new", "york"))
    assert(c12 == 3L)
    // hand 2x2: N = total bigrams, c1 = #(w1=new) = 3, c2 = #(w2=york)=3
    val n = docs.as[String].collect()
      .map(_.split(" ").length - 1).sum.toDouble
    def xlx(k: Double) = if (k > 0) k * math.log(k) else 0.0
    val exp = 2.0 * (xlx(3) + xlx(0) + xlx(0) + xlx(n - 3 - 3 + 3)
      - xlx(3) - xlx(n - 3) - xlx(3) - xlx(n - 3) + xlx(n))
    assert(math.abs(g2 - exp) < 1e-6, s"$g2 vs $exp")
  }

  test("heapsLaw: sublinear vocabulary growth fits beta < 1 with " +
      "strong r2; full-corpus counts are exact") {
    // Zipf-ish synthetic corpus: doc i repeats tokens from a ranked
    // vocabulary, so vocabulary grows sublinearly in tokens
    val docs = (1L to 256L).map { i =>
      val toks = (0 until 40).map(j => s"w${(i * 37 + j * j) % (j + 20)}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, "text", "doc_id", levels = 5)
      .head()
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 256L * 40) // exact full token count
    val beta = r.getDouble(3)
    assert(beta > 0.0 && beta < 1.0, s"beta $beta")
    assert(r.getDouble(5) > 0.8, s"r2 ${r.getDouble(5)}")
  }

  test("heapsLaw levels nest: level L is a subset of level L-1 by " +
      "construction (hash % 2^L = 0 implies % 2^(L-1) = 0)") {
    val docs = graft.Tables.documents(spark, SfDir)
    val r = TextAnalysis.heapsLaw(docs, "text", "doc_id", levels = 4)
      .head()
    // full corpus stats monotone vs registered lang stats is covered
    // elsewhere; here pin the fit is defined and finite on real data
    assert(!r.isNullAt(3) && !r.getDouble(3).isNaN)
    assert(r.getLong(1) > r.getLong(2),
      "token count must exceed type count")
  }

  test("llrBigrams favors frequent genuine collocations over rare " +
      "flukes PMI would over-reward") {
    val docs = (Seq.fill(20)("machine learning rocks") ++
      Seq("weird fluke here")).toDF("text")
    val top = TextAnalysis.llrBigrams(docs, "text", minCount = 1L)
      .orderBy(col("g2").desc).collect()
    val first = (top.head.getString(0), top.head.getString(1))
    assert(Set(("machine", "learning"), ("learning", "rocks"))
      .contains(first), s"top = $first")
  }

  test("stupidBackoffScore: in-model trigrams score without backoff; " +
      "an OOV tail walks the full backoff chain to the 0.16/N floor") {
    val docs = Seq((0L, "a b c a b c"), (1L, "a b c"), (3L, "a b x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(docs, "doc_id", "text",
      col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: one event (a,b,c): c3 = 2, c2(a,b) = 2 -> s = 1, ln = 0
    assert(out(1L) == ((1L, 0L, 0.0)), s"$out")
    // doc 3: (a,b,x): no c3, no c2(b,x), x OOV -> 0.4 * 0.4 * (1/6)
    val exp = BigDecimal(math.log(0.4 * (0.4 * (1.0 / 6.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L)._2 == 1L)
    assert(math.abs(out(3L)._3 - exp) < 2e-6, s"${out(3L)} vs $exp")
  }

  test("stupidBackoffScore: seen-bigram backoff uses 0.4*c2(v,w)/c1(v)" +
      " and fit docs are never scored") {
    val docs = Seq((0L, "a b c d b c"), (1L, "x b c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(docs, "doc_id", "text",
      col("doc_id") % 2 === 0).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L), "only doc 1 scored")
    val r = out.head
    // (x,b,c): no c3(x,b,c), but c2(b,c) = 2, c1(b) = 2 -> 0.4 * 1
    val exp = BigDecimal(math.log(0.4 * (2.0 / 2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - exp) < 2e-6, s"$r vs $exp")
  }

  test("codeDetection: symbol density and keyword rules flag code, " +
      "prose stays clean") {
    val docs = Seq(
      // code: braces/semicolons push symbol ppm way past 2%
      ("gh", "def f(x) { return x; } class A { var y = 1; }"),
      // code by keywords alone (2 hits: def, return), low symbols
      ("gh", "def run then return value and stop now yes ok fine"),
      // prose: no symbols, at most one keyword
      ("web", "the quick brown fox jumps over the lazy dog again"),
      ("web", "plain sentences with no markers at all here today")
    ).toDF("source", "text")
    val out = TextAnalysis.codeDetection(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(("gh", 2L, 2L), ("web", 2L, 0L)), s"$out")
  }

  test("freqOfFreqs: hand-counted 3-gram profile with GT discounts") {
    // doc A "a b c d" → shingles {a b c, b c d}; doc B "a b c" →
    // {a b c}. Counts: "a b c"=2, "b c d"=1 → n_1=1, n_2=1;
    // r*(1) = 2*1/1 = 2.0; r*(2) null (no n_3).
    val docs = Seq((1L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.freqOfFreqs(docs, "text").collect()
    assert(out.length == 2, s"${out.toSeq}")
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 1L
      && out(0).getDouble(2) == 2.0, s"${out(0)}")
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 1L
      && out(1).isNullAt(2), s"${out(1)}")
  }

  test("vocabCoverage: instance and type OOV against the train vocab") {
    // train (even ids): vocab {a, b, c}. test doc 1 (en): "a b x x" →
    // 4 instances, 2 OOV (x twice); types {a, b, x} → 1 OOV type.
    // test doc 3 (de): "c c" → fully covered.
    val docs = Seq(
      (0L, "en", "a b c"), (2L, "de", "b c"),
      (1L, "en", "a b x x"), (3L, "de", "c c")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.vocabCoverage(docs, "text", "lang",
      col("doc_id") % 2 === 0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out == Seq(
      ("de", 2L, 0L, 0L, 1L, 0L, 0L),
      ("en", 4L, 2L, 500000L, 3L, 1L, 333333L)), s"$out")
  }

  test("knContinuationCounts: hand-checked continuation lattice — a " +
      "one-collocation word scores below a versatile word of equal cf") {
    // 'francisco' appears 3x, always after 'san' (1 context);
    // 'walk' appears 3x after 3 different words
    val docs = Seq(
      (1L, "san francisco dogs walk"),
      (2L, "san francisco cats walk"),
      (3L, "san francisco birds walk")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.knContinuationCounts(docs, "doc_id", "text",
      topK = 50).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // bigram types: (san,francisco), (francisco,dogs/cats/birds),
    // (dogs/cats/birds,walk) -> 7 types total
    assert(got("walk")._1 == 3L && got("francisco")._1 == 1L)
    assert(got("walk")._2 > got("francisco")._2)
    assert(got("francisco")._2 == 0.142857) // half-away ppm of 1/7
  }

  test("distinctNgramDiversity: a mode-collapsed source scores lower " +
      "distinct-2 than a varied one; ppm exact") {
    val docs = Seq(
      ("rep", "the cat sat the cat sat the cat sat"),
      ("var", "one two three four five six seven eight nine")
    ).toDF("source", "text")
    val got = TextAnalysis.distinctNgramDiversity(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // rep: 9 tokens, 3 distinct, 8 bigrams, 3 distinct bigrams
    assert(got("rep") == ((9L, 3L, 333333L, 8L, 3L, 375000L)))
    // var: 9 tokens all distinct, 8 distinct bigrams
    assert(got("var") == ((9L, 9L, 1000000L, 8L, 8L, 1000000L)))
  }

  test("termBurstiness: equal cf, different df — the packed term " +
      "scores higher; minDf filters") {
    val docs = (
      (1 to 6).map(i => (i.toLong, "common")) ++          // cf 6, df 6
      (7 to 11).map(i =>
        (i.toLong, "bursty bursty bursty")) ++            // cf 15, df 5
      (1 to 4).map(i => (100L + i, "rare"))               // df 4 < minDf
    ).toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(docs, "doc_id", "text",
      minDf = 5L, topK = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSet == Set("common", "bursty"),
      s"rare must be df-filtered: ${got.toSeq}")
    val m = got.toMap
    assert(m("bursty") == ((5L, 15L, 3.0))) // 15 occurrences in 5 docs
    assert(m("common") == ((6L, 6L, 1.0)))
    assert(got.head._1 == "bursty", "ordered by burstiness desc")
  }

  test("knBigramScore: hand-computed Kneser–Ney probabilities on a " +
      "one-doc corpus") {
    // "a b a c a b": bigrams ab ba ac ca ab.
    // c2: ab=2 ba=1 ac=1 ca=1; c(a·)=3 c(b·)=1 c(c·)=1;
    // N1+(a·)=2 N1+(b·)=N1+(c·)=1; types {ab,ba,ac,ca} → tt=4;
    // N1+(·a)=2, N1+(·b)=N1+(·c)=1.
    // p(b|a)=(2−.75)/3+.75·2/3·(1/4)=.5416667
    // p(a|b)=(1−.75)/1+.75·1·(2/4)=.625     p(a|c)=.625
    // p(c|a)=(1−.75)/3+.75·2/3·(1/4)=.2083333
    val docs = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val r = TextAnalysis.knBigramScore(docs, "doc_id", "text")
      .collect().head
    assert(r.getLong(1) == 5L, "five bigram events")
    val expAvg = (math.log(2.5 / 3 / 2 + 0.125) * 2 + // p(b|a) twice
      math.log(0.625) * 2 + math.log(0.25 / 3 + 0.125)) / 5
    assert(math.abs(r.getDouble(2) - expAvg) < 1e-5, s"$r vs $expAvg")
    assert(math.abs(r.getDouble(3) - math.exp(-expAvg)) < 1e-4)
  }

  test("knBigramScore: the continuation term scores TYPE diversity — " +
      "equal bigram counts, but the many-context successor wins") {
    // 6 docs "wᵢ the" + 1 doc "x y": every bigram has count 1 and
    // context total 1, so the ML term is (1−D)/1 = 0.25 for all.
    // Types tt = 7; p_cont(the) = 6/7, p_cont(y) = 1/7 →
    // p(the|w1) = .25 + .75·6/7 ≈ .893 > p(y|x) = .25 + .75/7 ≈ .357.
    val docs = ((1 to 6).map(i => (100L + i, s"w$i the")) :+
      ((200L, "x y"))).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(101L) > out(200L),
      s"diverse-context successor must outscore the one-context one: $out")
    assert(math.abs(out(101L) - math.log(0.25 + 0.75 * 6.0 / 7.0)) < 1e-5)
    assert(math.abs(out(200L) - math.log(0.25 + 0.75 / 7.0)) < 1e-5)
    val again = TextAnalysis.knBigramScore(
      docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == again, "partitioning-independent")
  }
}
