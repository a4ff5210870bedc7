package graft.embed

/** Dimension-parameterized core of the in-repo transformer-encoder
  * training stack — the hand-derived analytic backprop (softmax
  * attention, LayerNorm, GELU, L2-normalization, MaxSim argmax
  * routing) that [[TinyEncoderTrain]] (vocab 64, d 16, themed
  * synthetic text) and [[CorpusEncoderTrain]] (BPE vocab over the
  * fixture corpus, d 32, contextual document towers) both instantiate.
  *
  * Everything here is strictfp-deterministic JVM double math (JEP
  * 306), sequential, and allocation-shaped exactly like the original
  * trainer, so the vocab-64/d-16 instance reproduces the committed
  * `tiny_encoder.onnx` byte-for-byte (pinned by TinyEncoderTrainSpec)
  * and every gradient is pinned against central finite differences at
  * BOTH dimension settings.
  *
  * Two MaxSim objectives ship:
  *   - [[lossAndGrad]]: pos/neg towers run PER TOKEN with L = 1 — the
  *     context-free document-token table deployment (63 rows of
  *     constants; what makes q351-class retrieval SQL-oracle-able);
  *   - [[lossAndGradSeq]]: pos/neg towers run as FULL SEQUENCES — real
  *     ColBERT document encoding, where attention gives each document
  *     token its neighbors (the bigram signal a bag-of-words ranker
  *     cannot see; this is what lets the corpus-trained ranker beat
  *     TF-IDF on held-out span retrieval, CorpusEncoderTrainSpec).
  */
object EncoderCore {
  type M = Array[Array[Double]]

  /** `rb`: learned RELATIVE-POSITION attention bias weights, one per
    * RBF bucket (empty when the instance runs content-only attention).
    * Initialized to ZEROS — no RNG draws, so enabling buckets never
    * shifts the init sequence of the other parameter groups (the tiny
    * encoder's byte-determinism pin depends on that). */
  final case class LW(wq: M, wk: M, wv: M, wo: M,
      w1: M, b1: Array[Double], w2: M, b2: Array[Double],
      g1: Array[Double], be1: Array[Double],
      g2: Array[Double], be2: Array[Double],
      rb: Array[Double] = Array.emptyDoubleArray)
  final case class W(emb: M, layers: Array[LW])

  final case class Triple(q: Array[Int], pos: Array[Int], neg: Array[Int])

  /** Per-layer cache of every intermediate the backward pass reads. */
  final case class LC(x: M, q: M, k: M, v: M, a: M, c: M,
      hat1: M, inv1: Array[Double], ln1: M, u: M, gl: M,
      hat2: M, inv2: Array[Double])
}

final class EncoderCore(val V: Int, val D: Int, val F: Int,
    val NLayers: Int, val NB: Int = 0) {

  import EncoderCore._

  // float-rounded graph constants, so the double-precision training
  // forward tracks the float32 runtime as closely as doubles can
  private val InvS = 1.0 / math.sqrt(D).toFloat.toDouble
  private val C2 = math.sqrt(2.0).toFloat.toDouble
  private val Eps = 1e-5f.toDouble

  /** RELATIVE-POSITION attention bias (T5-style in role, RBF in form),
    * present when `NB > 0` (NB odd): attention logits become
    * `q_i·k_j/√d + Σ_b rb_b · φ_b(j−i)` with the fixed basis
    * `φ_b(d) = exp(−2 (d − μ_b)²)`, μ_b = b − NB/2 (so μ spans
    * −NB/2..NB/2 around the diagonal; |d| ≥ μ_max+2 decays to ~0 and
    * far pairs keep pure content attention). Shift-INVARIANT by
    * construction — the same window of text produces the same states
    * at any document offset, which is what lets ColBERT span retrieval
    * learn local context. (Absolute sinusoidal encodings were tried
    * first and measured WORSE than no positions here: the query tower
    * and the document tower see the same span at different absolute
    * offsets, so absolute-position residue in the states is pure
    * cross-tower noise.) The basis is smooth, so the whole bias is
    * differentiable and rides the exported graph with stock ONNX ops
    * (Sub/Mul/Pow/Add over a position-ids input). `rb` starts at ZERO:
    * bias off ⇒ exactly the content-only encoder, and no RNG draws are
    * added to the init sequence. */
  val Mus: Array[Double] =
    if (NB <= 0) Array.emptyDoubleArray
    else Array.tabulate(NB)(b => (b - NB / 2).toDouble)

  /** φ_b matrices for sequence length L (cached per L — fixture docs
    * cap at 64 tokens, so this is a handful of small tables). */
  private val phiCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[M]]()
  private def phiFor(n: Int): Array[M] =
    phiCache.computeIfAbsent(n, len =>
      Array.tabulate(NB) { b =>
        Array.tabulate(len, len) { (i, j) =>
          val d = (j - i).toDouble - Mus(b)
          math.exp(-2.0 * d * d).toFloat.toDouble
        }
      })

  // ------------------------------------------------------------ algebra
  private def zeros(n: Int, m: Int): M = Array.fill(n)(new Array[Double](m))

  /** a (n×k) · b (k×m) */
  private def mm(a: M, b: M): M = {
    val n = a.length; val k = b.length; val m = b(0).length
    val out = zeros(n, m)
    var i = 0
    while (i < n) {
      val ai = a(i); val oi = out(i)
      var t = 0
      while (t < k) {
        val av = ai(t); val bt = b(t)
        var j = 0
        while (j < m) { oi(j) += av * bt(j); j += 1 }
        t += 1
      }
      i += 1
    }
    out
  }
  /** a (n×k) · bᵀ (m×k) → n×m */
  private def mmNT(a: M, b: M): M = {
    val n = a.length; val m = b.length; val k = a(0).length
    val out = zeros(n, m)
    var i = 0
    while (i < n) {
      val ai = a(i); val oi = out(i)
      var j = 0
      while (j < m) {
        val bj = b(j); var s = 0.0; var t = 0
        while (t < k) { s += ai(t) * bj(t); t += 1 }
        oi(j) = s; j += 1
      }
      i += 1
    }
    out
  }
  /** aᵀ (k×n) · b (k×m) → n×m, ACCUMULATED into acc */
  private def mmTNInto(a: M, b: M, acc: M): Unit = {
    val k = a.length; val n = a(0).length; val m = b(0).length
    var t = 0
    while (t < k) {
      val at = a(t); val bt = b(t)
      var i = 0
      while (i < n) {
        val av = at(i); val ai = acc(i)
        var j = 0
        while (j < m) { ai(j) += av * bt(j); j += 1 }
        i += 1
      }
      t += 1
    }
  }
  private def addInto(a: M, b: M): Unit = {
    var i = 0
    while (i < a.length) {
      val ai = a(i); val bi = b(i); var j = 0
      while (j < ai.length) { ai(j) += bi(j); j += 1 }
      i += 1
    }
  }
  private def colSumInto(a: M, acc: Array[Double]): Unit =
    a.foreach { row =>
      var j = 0
      while (j < row.length) { acc(j) += row(j); j += 1 }
    }

  private def erf(z: Double): Double = {
    // same Chebyshev erfc fit class the runtime uses; training only
    // needs smooth consistency with its own derivative
    val t = 1.0 / (1.0 + 0.5 * math.abs(z))
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (z >= 0) 1.0 - ans else ans - 1.0
  }
  private def gelu(x: Double): Double = 0.5 * x * (1.0 + erf(x / C2))
  private def geluGrad(x: Double): Double =
    0.5 * (1.0 + erf(x / C2)) +
      x * math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.Pi)

  // ------------------------------------------------------------ forward
  private def lnFwd(r: M, g: Array[Double], be: Array[Double])
      : (M, M, Array[Double]) = {
    val n = r.length; val d = r(0).length
    val out = zeros(n, d); val hat = zeros(n, d)
    val inv = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = r(i)
      var mu = 0.0; var j = 0
      while (j < d) { mu += row(j); j += 1 }
      mu /= d
      var va = 0.0; j = 0
      while (j < d) { val t = row(j) - mu; va += t * t; j += 1 }
      va /= d
      val iv = 1.0 / math.sqrt(va + Eps)
      inv(i) = iv
      j = 0
      while (j < d) {
        val h = (row(j) - mu) * iv
        hat(i)(j) = h; out(i)(j) = g(j) * h + be(j); j += 1
      }
      i += 1
    }
    (out, hat, inv)
  }

  private def layerFwd(x: M, lw: LW): (M, LC) = {
    val q = mm(x, lw.wq); val k = mm(x, lw.wk); val v = mm(x, lw.wv)
    val sc = mmNT(q, k)
    val phi = if (NB > 0) phiFor(x.length) else null
    val a = sc.zipWithIndex.map { case (row, i) =>
      val scaled = row.zipWithIndex.map { case (s, j) =>
        var t = s * InvS
        if (phi != null) {
          var b = 0
          while (b < NB) { t += lw.rb(b) * phi(b)(i)(j); b += 1 }
        }
        t
      }
      val mx = scaled.max
      val es = scaled.map(s => math.exp(s - mx))
      val sum = es.sum
      es.map(_ / sum)
    }
    val c = mm(a, v)
    val p = mm(c, lw.wo)
    val r1 = p.zip(x).map { case (pr, xr) =>
      Array.tabulate(pr.length)(j => pr(j) + xr(j)) }
    val (ln1, hat1, inv1) = lnFwd(r1, lw.g1, lw.be1)
    val u = mm(ln1, lw.w1)
    for (row <- u; j <- row.indices) row(j) += lw.b1(j)
    val gl = u.map(_.map(gelu))
    val o = mm(gl, lw.w2)
    for (row <- o; j <- row.indices) row(j) += lw.b2(j)
    val r2 = o.zip(ln1).map { case (or, lr) =>
      Array.tabulate(or.length)(j => or(j) + lr(j)) }
    val (y, hat2, inv2) = lnFwd(r2, lw.g2, lw.be2)
    (y, LC(x, q, k, v, a, c, hat1, inv1, ln1, u, gl, hat2, inv2))
  }

  /** ids → (L2-normalized per-token states, raw states, caches). */
  def forward(ids: Array[Int], w: W): (M, M, Array[LC]) = {
    var x: M = ids.map(id => w.emb(id).clone())
    val caches = new Array[LC](w.layers.length)
    var l = 0
    while (l < w.layers.length) {
      val (y, lc) = layerFwd(x, w.layers(l))
      caches(l) = lc; x = y; l += 1
    }
    val yhat = x.map { row =>
      val n = math.sqrt(row.map(t => t * t).sum)
      if (n == 0.0) row.clone() else row.map(_ / n)
    }
    (yhat, x, caches)
  }

  // ----------------------------------------------------------- backward
  private def lnBwd(dy: M, hat: M, inv: Array[Double],
      g: Array[Double], dg: Array[Double], dbe: Array[Double]): M = {
    val n = dy.length; val d = dy(0).length
    val dx = zeros(n, d)
    var i = 0
    while (i < n) {
      val dyi = dy(i); val hi = hat(i)
      var mDh = 0.0; var mDhH = 0.0
      var j = 0
      while (j < d) {
        dg(j) += dyi(j) * hi(j); dbe(j) += dyi(j)
        val dh = dyi(j) * g(j)
        mDh += dh; mDhH += dh * hi(j); j += 1
      }
      mDh /= d; mDhH /= d
      j = 0
      while (j < d) {
        dx(i)(j) = inv(i) * (dyi(j) * g(j) - mDh - hi(j) * mDhH)
        j += 1
      }
      i += 1
    }
    dx
  }

  private def layerBwd(dy: M, lc: LC, lw: LW, gl: LW): M = {
    val dr2 = lnBwd(dy, lc.hat2, lc.inv2, lw.g2, gl.g2, gl.be2)
    // o = gl·w2 + b2 ; r2 = o + ln1
    mmTNInto(lc.gl, dr2, gl.w2); colSumInto(dr2, gl.b2)
    val dgl = mmNT(dr2, lw.w2) // dr2 · w2ᵀ (mmNT transposes its b)
    val du = dgl.zip(lc.u).map { case (dr, ur) =>
      Array.tabulate(dr.length)(j => dr(j) * geluGrad(ur(j))) }
    mmTNInto(lc.ln1, du, gl.w1); colSumInto(du, gl.b1)
    val dln1 = mmNT(du, lw.w1)
    addInto(dln1, dr2) // residual r2 = o + ln1
    val dr1 = lnBwd(dln1, lc.hat1, lc.inv1, lw.g1, gl.g1, gl.be1)
    // p = c·wo ; r1 = p + x
    mmTNInto(lc.c, dr1, gl.wo)
    val dc = mmNT(dr1, lw.wo)
    // c = a·v
    val da = mmNT(dc, lc.v)
    val dv = zeros(lc.v.length, lc.v(0).length)
    mmTNInto(lc.a, dc, dv)
    // softmax rows: dTotal is the gradient at the LOGITS (content·1/√d
    // + relative bias); the bias weights take it directly, the content
    // path folds in the 1/√d scale as before
    val dTotal = da.zip(lc.a).map { case (dai, ai) =>
      var dot = 0.0; var j = 0
      while (j < ai.length) { dot += dai(j) * ai(j); j += 1 }
      Array.tabulate(ai.length)(t => ai(t) * (dai(t) - dot))
    }
    if (NB > 0) {
      val phi = phiFor(lc.x.length)
      var b = 0
      while (b < NB) {
        var s = 0.0; var i = 0
        while (i < dTotal.length) {
          val di = dTotal(i); val pi = phi(b)(i); var j = 0
          while (j < di.length) { s += di(j) * pi(j); j += 1 }
          i += 1
        }
        gl.rb(b) += s; b += 1
      }
    }
    val dsc = dTotal.map(_.map(_ * InvS))
    val dq = mm(dsc, lc.k)
    val dk = zeros(lc.k.length, lc.k(0).length)
    mmTNInto(dsc, lc.q, dk)
    mmTNInto(lc.x, dq, gl.wq); mmTNInto(lc.x, dk, gl.wk)
    mmTNInto(lc.x, dv, gl.wv)
    val dx = mmNT(dq, lw.wq)
    addInto(dx, mmNT(dk, lw.wk))
    addInto(dx, mmNT(dv, lw.wv))
    addInto(dx, dr1) // residual r1 = p + x
    dx
  }

  /** Backward from d(normalized states) through the whole tower,
    * accumulating parameter gradients into `g` (same shape as w). */
  def towerBwd(dyhat: M, yraw: M, ids: Array[Int], caches: Array[LC],
      w: W, g: W): Unit = {
    val dy = dyhat.zip(yraw).map { case (dh, t) =>
      val n = math.sqrt(t.map(x => x * x).sum)
      if (n == 0.0) dh.clone()
      else {
        val that = t.map(_ / n)
        var dot = 0.0; var j = 0
        while (j < t.length) { dot += that(j) * dh(j); j += 1 }
        Array.tabulate(t.length)(j => (dh(j) - that(j) * dot) / n)
      }
    }
    var grad = dy
    var l = caches.length - 1
    while (l >= 0) {
      grad = layerBwd(grad, caches(l), w.layers(l), g.layers(l))
      l -= 1
    }
    var i = 0
    while (i < ids.length) {
      val ge = g.emb(ids(i)); val gr = grad(i)
      var j = 0
      while (j < ge.length) { ge(j) += gr(j); j += 1 }
      i += 1
    }
  }

  // --------------------------------------------------- MaxSim objective
  /** mean_j max_i q̂_j·d̂_i with the argmax per query token. */
  def maxsim(qh: M, dh: M): (Double, Array[Int]) = {
    val arg = new Array[Int](qh.length)
    var s = 0.0
    var j = 0
    while (j < qh.length) {
      var best = Double.NegativeInfinity; var bi = 0
      var i = 0
      while (i < dh.length) {
        var d = 0.0; var t = 0
        while (t < D) { d += qh(j)(t) * dh(i)(t); t += 1 }
        if (d > best) { best = d; bi = i }
        i += 1
      }
      s += best; arg(j) = bi; j += 1
    }
    (s / qh.length, arg)
  }

  /** Triplet hinge loss + full gradient accumulation into `g`.
    * Returns the loss. Document towers run each token as an L=1
    * sequence through the same encoder (the context-free table the
    * SQL-oracle-able deployment joins against). */
  def lossAndGrad(w: W, t: Triple, margin: Double, g: W): Double = {
    val (qh, qraw, qc) = forward(t.q, w)
    val pos = t.pos.map(id => forward(Array(id), w))
    val neg = t.neg.map(id => forward(Array(id), w))
    val ph: M = pos.map(_._1(0))
    val nh: M = neg.map(_._1(0))
    val (sp, argP) = maxsim(qh, ph)
    val (sn, argN) = maxsim(qh, nh)
    val loss = math.max(0.0, margin - sp + sn)
    if (loss == 0.0) return 0.0
    val inv = 1.0 / t.q.length
    val dqh = zeros(qh.length, D)
    val dph = zeros(ph.length, D)
    val dnh = zeros(nh.length, D)
    var j = 0
    while (j < qh.length) {
      val ip = argP(j); val in = argN(j)
      var k = 0
      while (k < D) {
        dqh(j)(k) += inv * (nh(in)(k) - ph(ip)(k))
        dph(ip)(k) -= inv * qh(j)(k)
        dnh(in)(k) += inv * qh(j)(k)
        k += 1
      }
      j += 1
    }
    towerBwd(dqh, qraw, t.q, qc, w, g)
    var i = 0
    while (i < pos.length) {
      towerBwd(Array(dph(i)), pos(i)._2, Array(t.pos(i)), pos(i)._3, w, g)
      i += 1
    }
    i = 0
    while (i < neg.length) {
      towerBwd(Array(dnh(i)), neg(i)._2, Array(t.neg(i)), neg(i)._3, w, g)
      i += 1
    }
    loss
  }

  def lossOnly(w: W, t: Triple, margin: Double): Double = {
    val (qh, _, _) = forward(t.q, w)
    val ph: M = t.pos.map(id => forward(Array(id), w)._1(0))
    val nh: M = t.neg.map(id => forward(Array(id), w)._1(0))
    math.max(0.0, margin - maxsim(qh, ph)._1 + maxsim(qh, nh)._1)
  }

  /** CONTEXTUAL-tower variant of [[lossAndGrad]]: pos/neg run as full
    * sequences through the encoder, so document token states carry
    * their neighbors (real ColBERT document encoding). Same triplet
    * hinge on MaxSim; the gradient routes into the argmax document
    * positions of each tower. */
  def lossAndGradSeq(w: W, t: Triple, margin: Double, g: W): Double = {
    val (qh, qraw, qc) = forward(t.q, w)
    val (ph, praw, pc) = forward(t.pos, w)
    val (nh, nraw, nc) = forward(t.neg, w)
    val (sp, argP) = maxsim(qh, ph)
    val (sn, argN) = maxsim(qh, nh)
    val loss = math.max(0.0, margin - sp + sn)
    if (loss == 0.0) return 0.0
    val inv = 1.0 / t.q.length
    val dqh = zeros(qh.length, D)
    val dph = zeros(ph.length, D)
    val dnh = zeros(nh.length, D)
    var j = 0
    while (j < qh.length) {
      val ip = argP(j); val in = argN(j)
      var k = 0
      while (k < D) {
        dqh(j)(k) += inv * (nh(in)(k) - ph(ip)(k))
        dph(ip)(k) -= inv * qh(j)(k)
        dnh(in)(k) += inv * qh(j)(k)
        k += 1
      }
      j += 1
    }
    towerBwd(dqh, qraw, t.q, qc, w, g)
    towerBwd(dph, praw, t.pos, pc, w, g)
    towerBwd(dnh, nraw, t.neg, nc, w, g)
    loss
  }

  def lossOnlySeq(w: W, t: Triple, margin: Double): Double = {
    val (qh, _, _) = forward(t.q, w)
    val (ph, _, _) = forward(t.pos, w)
    val (nh, _, _) = forward(t.neg, w)
    math.max(0.0, margin - maxsim(qh, ph)._1 + maxsim(qh, nh)._1)
  }

  // ----------------------------------------------------------- training
  def initWeights(seed: Long): W = {
    val rng = new java.util.Random(seed)
    def mat(n: Int, m: Int, sc: Double): M =
      Array.fill(n)(Array.fill(m)(rng.nextGaussian() * sc))
    def lw(): LW = LW(
      wq = mat(D, D, 0.25), wk = mat(D, D, 0.25),
      wv = mat(D, D, 0.25), wo = mat(D, D, 0.25),
      w1 = mat(D, F, 0.25), b1 = new Array[Double](F),
      w2 = mat(F, D, 0.2), b2 = new Array[Double](D),
      g1 = Array.fill(D)(1.0), be1 = new Array[Double](D),
      g2 = Array.fill(D)(1.0), be2 = new Array[Double](D),
      rb = new Array[Double](NB)) // zero init, no RNG draw
    W(emb = mat(V, D, 0.5), layers = Array.fill(NLayers)(lw()))
  }

  def zeroLike(w: W): W = W(
    emb = zeros(V, D),
    layers = w.layers.map(_ => LW(
      zeros(D, D), zeros(D, D), zeros(D, D), zeros(D, D),
      zeros(D, F), new Array[Double](F), zeros(F, D),
      new Array[Double](D), new Array[Double](D), new Array[Double](D),
      new Array[Double](D), new Array[Double](D),
      new Array[Double](NB))))

  def sgd(w: W, g: W, lr: Double): Unit = {
    def upM(a: M, b: M): Unit = {
      var i = 0
      while (i < a.length) {
        val ai = a(i); val bi = b(i); var j = 0
        while (j < ai.length) { ai(j) -= lr * bi(j); j += 1 }
        i += 1
      }
    }
    def upV(a: Array[Double], b: Array[Double]): Unit = {
      var j = 0
      while (j < a.length) { a(j) -= lr * b(j); j += 1 }
    }
    upM(w.emb, g.emb)
    w.layers.zip(g.layers).foreach { case (lw, gl) =>
      upM(lw.wq, gl.wq); upM(lw.wk, gl.wk); upM(lw.wv, gl.wv)
      upM(lw.wo, gl.wo); upM(lw.w1, gl.w1); upV(lw.b1, gl.b1)
      upM(lw.w2, gl.w2); upV(lw.b2, gl.b2)
      upV(lw.g1, gl.g1); upV(lw.be1, gl.be1)
      upV(lw.g2, gl.g2); upV(lw.be2, gl.be2)
      upV(lw.rb, gl.rb)
    }
  }

  // ------------------------------------------------------------- export
  def toEncoderW(w: W): OnnxWrite.EncoderW = {
    def flat(m: M): Array[Float] = m.flatten.map(_.toFloat)
    def vf(a: Array[Double]): Array[Float] = a.map(_.toFloat)
    OnnxWrite.EncoderW(V, D, F, flat(w.emb), w.layers.toSeq.map(l =>
      OnnxWrite.LayerW(flat(l.wq), flat(l.wk), flat(l.wv), flat(l.wo),
        flat(l.w1), vf(l.b1), flat(l.w2), vf(l.b2),
        vf(l.g1), vf(l.be1), vf(l.g2), vf(l.be2), vf(l.rb))))
  }
}
