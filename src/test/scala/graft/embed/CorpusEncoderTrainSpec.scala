package graft.embed

import graft.SparkSpec
import graft.text.Bpe

/** [[CorpusEncoderTrain]] — the corpus-trained (real-BPE, d-32,
  * contextual-tower) encoder. Pins, in order: the BPE tokenizer
  * fixture (byte-identical retrain + the full-merge property that
  * makes BPE retrieval SQL-oracle-able), the contextual-tower gradient
  * (central finite differences at the corpus dims), the encoder
  * fixture (byte-identical retrain), and the QUALITY claim — held-out
  * span-retrieval recall@10 of the trained ColBERT ranking vs the
  * TF-IDF ranking and vs the untrained encoder (the A/B the ranker
  * comparison query family rides).
  */
class CorpusEncoderTrainSpec extends SparkSpec {

  private val CorpusDir = "/root/testdata/sf0.01"

  private def docsDf = graft.Tables.documents(spark, CorpusDir)

  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    assert(in != null, s"fixture $path missing")
    val b = in.readAllBytes(); in.close(); b
  }

  test("BPE retrain is byte-identical to the committed merge table, " +
      "fully merges every corpus word to one symbol, and induces the " +
      "committed vocab") {
    val model = CorpusEncoderTrain.trainBpe(docsDf)
    val tmp = java.nio.file.Files.createTempFile("bpe", ".txt")
    Bpe.save(model, tmp.toString)
    val fresh = java.nio.file.Files.readAllBytes(tmp)
    java.nio.file.Files.delete(tmp)
    assert(java.util.Arrays.equals(fresh,
      resourceBytes(CorpusEncoderTrain.BpeResource)),
      "BPE retrain differs from committed corpus_bpe.txt — " +
        "run `runMain graft.embed.CorpusEncoderTrain` to regenerate")
    val words = CorpusEncoderTrain.corpusWords(docsDf)
    assert(words.nonEmpty)
    for (w <- words) {
      val enc = model.encodeWord(w)
      assert(enc == Seq(w + Bpe.EndOfWord),
        s"corpus word '$w' did not merge to a single symbol: $enc")
    }
    val vocab = CorpusEncoderTrain.vocabOf(model, words)
    val committed = new String(
      resourceBytes(CorpusEncoderTrain.VocabResource), "UTF-8")
      .split("\n").toVector.filter(_.nonEmpty)
    assert(vocab == committed, "induced vocab differs from fixture")
  }

  test("contextual-tower analytic gradients (lossAndGradSeq) match " +
      "central finite differences at the corpus dims — including the " +
      "relative-position bias weights") {
    val core = new EncoderCore(32, CorpusEncoderTrain.D,
      CorpusEncoderTrain.F, CorpusEncoderTrain.NLayers,
      NB = CorpusEncoderTrain.RbBuckets)
    val t = EncoderCore.Triple(
      q = Array(3, 9, 17, 30),
      pos = Array(3, 9, 17, 30, 5, 21, 11, 2),
      neg = Array(28, 1, 12, 7, 19, 25))
    val w = core.initWeights(7L)
    w.layers.foreach { l => // bias path must be ACTIVE under the check
      l.rb(core.NB / 2 - 1) = CorpusEncoderTrain.LocalityPrior
      l.rb(core.NB / 2 + 1) = CorpusEncoderTrain.LocalityPrior
    }
    val g = core.zeroLike(w)
    val loss = core.lossAndGradSeq(w, t, margin = 1.0, g)
    assert(loss > 0.0, "hinge must be active for the check")
    val h = 1e-6
    def check(get: () => Double, set: Double => Unit, analytic: Double,
        what: String): Unit = {
      val v0 = get()
      set(v0 + h); val lp = core.lossOnlySeq(w, t, margin = 1.0)
      set(v0 - h); val lm = core.lossOnlySeq(w, t, margin = 1.0)
      set(v0)
      val numeric = (lp - lm) / (2 * h)
      val tol = 1e-4 * math.max(1.0, math.abs(numeric))
      assert(math.abs(numeric - analytic) < tol,
        s"$what: numeric=$numeric analytic=$analytic")
    }
    for (id <- Seq(3, 28, 9); j <- Seq(0, 13, 31))
      check(() => w.emb(id)(j), v => w.emb(id)(j) = v, g.emb(id)(j),
        s"emb($id)($j)")
    for (l <- 0 until core.NLayers) {
      val lw = w.layers(l); val gl = g.layers(l)
      def checkM(m: EncoderCore.M, gm: EncoderCore.M, name: String): Unit =
        for ((i, j) <- Seq((0, 0), (5, 17), (m.length - 1, m(0).length - 1)))
          check(() => m(i)(j), v => m(i)(j) = v, gm(i)(j),
            s"l$l.$name($i)($j)")
      def checkV(a: Array[Double], ga: Array[Double], name: String): Unit =
        for (j <- Seq(0, a.length / 2, a.length - 1))
          check(() => a(j), v => a(j) = v, ga(j), s"l$l.$name($j)")
      checkM(lw.wq, gl.wq, "wq"); checkM(lw.wk, gl.wk, "wk")
      checkM(lw.wv, gl.wv, "wv"); checkM(lw.wo, gl.wo, "wo")
      checkM(lw.w1, gl.w1, "w1"); checkM(lw.w2, gl.w2, "w2")
      checkV(lw.b1, gl.b1, "b1"); checkV(lw.b2, gl.b2, "b2")
      checkV(lw.g1, gl.g1, "g1"); checkV(lw.be1, gl.be1, "be1")
      checkV(lw.g2, gl.g2, "g2"); checkV(lw.be2, gl.be2, "be2")
      checkV(lw.rb, gl.rb, "rb")
    }
  }

  test("encoder retrain from the committed BPE fixture is " +
      "byte-identical to the committed corpus_encoder.onnx") {
    val bpe = CorpusColbert.trained.bpe
    val (vocab, onnx) = CorpusEncoderTrain.trainAll(docsDf, bpe)
    assert(vocab == CorpusColbert.trained.syms)
    assert(java.util.Arrays.equals(onnx,
      resourceBytes(CorpusEncoderTrain.OnnxResource)),
      s"retrain produced ${onnx.length} bytes vs committed — training " +
        "is not deterministic or the fixture is stale")
  }

  test("held-out span retrieval: the corpus-trained ColBERT ranking " +
      "beats TF-IDF and the untrained encoder on recall@10 (the " +
      "ranker A/B, measured, not asserted from prose)") {
    val enc = CorpusColbert.trained
    val rows = docsDf.select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // ------- candidate states: trained AND untrained (control) -------
    // the control shares the full architecture INCLUDING the locality
    // prior — what's measured is the effect of the training steps, not
    // of the prior (the prior alone scores ≈ TF-IDF; see trainer doc)
    val core = new EncoderCore(enc.vocab, CorpusEncoderTrain.D,
      CorpusEncoderTrain.F, CorpusEncoderTrain.NLayers,
      NB = CorpusEncoderTrain.RbBuckets)
    val w0 = core.initWeights(CorpusEncoderTrain.Seed)
    w0.layers.foreach { l =>
      l.rb(core.NB / 2 - 1) = CorpusEncoderTrain.LocalityPrior
      l.rb(core.NB / 2 + 1) = CorpusEncoderTrain.LocalityPrior
    }
    val enc0 = CorpusColbert(
      OnnxWrite.encoderModel(core.toEncoderW(w0)), enc.bpe, enc.syms)
    def states(e: CorpusColbert): Map[Long, Array[Array[Float]]] =
      rows.map { case (id, text) => id ->
        e.contextualStates(text, CorpusEncoderTrain.MaxDocTokens) }.toMap
    val stT = states(enc)
    val st0 = states(enc0)
    def maxsim(q: Array[Array[Float]], d: Array[Array[Float]]): Double = {
      if (q.isEmpty || d.isEmpty) return Double.MinValue
      var s = 0.0
      for (qj <- q) {
        var best = Double.MinValue
        for (di <- d) {
          var dot = 0.0; var t = 0
          while (t < qj.length) { dot += qj(t).toDouble * di(t); t += 1 }
          if (dot > best) best = dot
        }
        s += best
      }
      s / q.length
    }
    // ----------------- TF-IDF baseline (q58's math) ------------------
    // word-level (collision-free — GENEROUS to the baseline), tf ×
    // ln((m+1)/(df+1)), L2-normalized, cosine
    def toks(t: String): Array[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val m = rows.length.toDouble
    val df = scala.collection.mutable.Map.empty[String, Int]
    for ((_, text) <- rows; w <- toks(text).distinct)
      df(w) = df.getOrElse(w, 0) + 1
    def tfidf(ws: Array[String]): Map[String, Double] = {
      val tf = ws.groupBy(identity).map { case (w, g) => w -> g.length }
      val raw = tf.map { case (w, c) =>
        w -> c * math.log((m + 1.0) / (df.getOrElse(w, 0) + 1.0)) }
      val n = math.sqrt(raw.values.map(v => v * v).sum)
      if (n == 0.0) raw else raw.map { case (w, v) => w -> v / n }
    }
    val docVecs = rows.map { case (id, text) =>
      id -> tfidf(toks(text)) }.toMap
    def cos(a: Map[String, Double], b: Map[String, Double]): Double =
      a.iterator.map { case (w, v) => v * b.getOrElse(w, 0.0) }.sum
    // --------------------- held-out span queries ---------------------
    val rng = new java.util.Random(20260818L)
    val held = rows.filter { case (id, text) =>
      CorpusEncoderTrain.isHeldOut(id) && toks(text).length >= 16 }
    assert(held.length >= 80, s"held-out set too small: ${held.length}")
    var hitT = 0; var hit0 = 0; var hitTf = 0
    for ((id, text) <- held) {
      val ws = toks(text)
      val start = rng.nextInt(ws.length - 8 + 1)
      val span = ws.slice(start, start + 8)
      val qT = enc.contextualStates(span.mkString(" "))
      val q0 = enc0.contextualStates(span.mkString(" "))
      val qv = tfidf(span)
      def top10(score: Long => Double): Seq[Long] =
        rows.toSeq.map(_._1).sortBy(i => (-score(i), i)).take(10)
      if (top10(i => maxsim(qT, stT(i))).contains(id)) hitT += 1
      if (top10(i => maxsim(q0, st0(i))).contains(id)) hit0 += 1
      if (top10(i => cos(qv, docVecs(i))).contains(id)) hitTf += 1
    }
    val n = held.length.toDouble
    val (rT, r0, rTf) = (hitT / n, hit0 / n, hitTf / n)
    info(f"recall@10 over ${held.length} held-out span queries: " +
      f"trained=$rT%.3f tfidf=$rTf%.3f untrained=$r0%.3f")
    assert(rT > rTf + 0.10,
      f"trained ColBERT ($rT%.3f) must beat TF-IDF ($rTf%.3f) by > 0.10")
    assert(rT > r0 + 0.10,
      f"trained ($rT%.3f) must beat the untrained control ($r0%.3f)")
  }
}
