package graft.ingest

import java.awt.image.BufferedImage

import graft.embed.{Onnx, OnnxWrite}

/** Open(er)-vocabulary OCR — the NEURAL fourth implementation of the
  * [[OcrEngine]] seam (reference runs EasyOCR en+ko over page rasters,
  * `backend/process/parsing.py:37-41`): the same
  * [[GlyphSegmenter]] front end as the template engine, but glyphs
  * classify through a REAL trained MLP executed by the in-repo ONNX
  * runtime ([[Onnx.run]]), so recognition is no longer tied to the
  * 38-glyph 5×7 template alphabet:
  *
  *   - LATIN + DIGITS are learned from glyphs RENDERED WITH THE
  *     CONTAINER'S REAL FONTS (DejaVu Sans / Serif / Mono / Condensed
  *     via java.awt, multiple sizes, anti-aliased) — fonts far outside
  *     the template bitmaps;
  *   - HANGUL (the reference's `ko` leg) comes from [[HangulFont]], a
  *     small in-repo jamo-compositional raster font (no Korean font
  *     ships in this container — `Font.canDisplay('한') == false` for
  *     every installed family — so the font itself is built from jamo
  *     the way Hangul actually composes);
  *   - training ([[NeuralOcrTrain]]) is seeded, sequential and
  *     bit-deterministic; the committed export
  *     `resources/graft/ocr_glyph.onnx` is byte-pinned to a retrain.
  *
  * Fail-row semantics are unchanged (`parsing.py:139-154` parity): a
  * glyph below the confidence gate becomes '?' (never a silent wrong
  * letter), and blank/undecodable pages stay Left.
  */
object NeuralOcrEngine extends OcrEngine {

  val Grid = 12 // 12×12 gray coverage + the box-aspect feature

  /** Class alphabet (model output order); one extra JUNK output
    * follows, trained on seeded noise blobs so non-text ink REJECTS
    * by classification, not just by threshold. */
  val Labels: String = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" +
    HangulFont.Glyphs.map(_._1).mkString

  /** Accept when the top class holds a clear majority of the softmax
    * mass; otherwise '?' (the reference's fail-not-fabricate rule). */
  val MinProb = 0.5
  val MinRatio = 2.0

  /** Classic OCR confusion sets: glyph pairs whose shapes genuinely
    * coincide across typefaces (a monospaced 'O' and a proportional
    * '0' are the same oval at the same aspect — only context separates
    * them, and a glyph classifier has none). Inside a set the engine
    * demands near-certainty; otherwise '?' beats a plausible-but-wrong
    * letter. */
  val ConfusionSets = Seq("O0", "I1", "S5", "Z2", "B8")
  val ConfusionMinProb = 0.85f

  def name = "neural-mlp12"

  /** Feature vector: flattened gray coverage + box aspect (clamped —
    * the discriminator between 'O' and '0', which the square resample
    * otherwise erases). */
  private[ingest] def features(cov: Array[Array[Double]],
      aspect: Double): Array[Float] = {
    val x = new Array[Float](Grid * Grid + 1)
    var i = 0
    while (i < Grid) {
      var j = 0
      while (j < Grid) { x(i * Grid + j) = cov(i)(j).toFloat; j += 1 }
      i += 1
    }
    x(Grid * Grid) = math.min(aspect, 2.0).toFloat
    x
  }

  @transient private lazy val graph: Onnx.Graph = {
    val in = getClass.getResourceAsStream("/graft/ocr_glyph.onnx")
    require(in != null, "fixture /graft/ocr_glyph.onnx missing — run " +
      "`runMain graft.ingest.NeuralOcrTrain` to regenerate")
    val bytes = in.readAllBytes(); in.close()
    Onnx.load(bytes)
  }

  private[ingest] def classify(cov: Array[Array[Double]],
      aspect: Double): Char = {
    val x = features(cov, aspect)
    val p = Onnx.run(graph, Map("x" -> Onnx.Tensor(
      Array(1, x.length), x)))(graph.outputs.head).data
    var b1 = 0; var b2 = -1
    var i = 1
    while (i < p.length) {
      if (p(i) > p(b1)) { b2 = b1; b1 = i }
      else if (b2 < 0 || p(i) > p(b2)) b2 = i
      i += 1
    }
    // the last output is the junk class — always '?'
    if (b1 >= Labels.length) '?'
    else {
      val confusable = b2 >= 0 && b2 < Labels.length &&
        ConfusionSets.exists(s =>
          s.contains(Labels(b1)) && s.contains(Labels(b2)))
      if (confusable && p(b1) < ConfusionMinProb) '?'
      else if (p(b1) >= MinProb && (b2 < 0 || p(b1) >= MinRatio * p(b2)))
        Labels(b1)
      else '?'
    }
  }

  def recognize(imageBytes: Array[Byte]): Either[String, String] =
    GlyphSegmenter.segment(imageBytes, Grid, Grid, 5, 7).flatMap {
      lines =>
        val text = lines.map { glyphs =>
          val sb = new StringBuilder
          glyphs.foreach { g =>
            if (g.spaceBefore) sb.append(' ')
            sb.append(
              if (g.subHeight) { if (g.wide) '-' else '.' }
              else classify(g.cov, g.aspect))
          }
          sb.toString
        }.mkString("\n").trim
        if (text.isEmpty) Left("no glyphs found")
        else {
          // page-level confidence (reference parity: EasyOCR pages
          // below the confidence bar become fail rows, not text): a
          // majority-rejected page is noise, and any stray accepted
          // glyph on it would be fabrication
          val letters = text.count(c => c != ' ' && c != '\n')
          val rejected = text.count(_ == '?')
          if (rejected * 2 > letters) Left("low recognition confidence")
          else Right(text)
        }
    }
}

/** A minimal in-repo Hangul raster font, built the way Hangul is
  * built: jamo (consonant/vowel letters) composed into syllable
  * blocks — initial + vowel (+ optional final) laid out by the
  * vowel's orientation (horizontal-stem vowels put the initial left;
  * vertical-stem vowels stack). 16×16 cells per syllable. Scope is
  * the syllables the specs exercise; adding a syllable is one line. */
object HangulFont {

  private val J: Map[Char, Seq[String]] = Map(
    'ㄱ' -> Seq("11111", "00001", "00001", "00001", "00001"),
    'ㄴ' -> Seq("10000", "10000", "10000", "10000", "11111"),
    'ㅅ' -> Seq("00100", "00100", "01010", "01010", "10001"),
    'ㅇ' -> Seq("01110", "10001", "10001", "10001", "01110"),
    'ㅎ' -> Seq("00100", "11111", "01110", "10001", "01110"),
    'ㅍ' -> Seq("11111", "01010", "01010", "01010", "11111"),
    'ㅋ' -> Seq("11111", "00001", "01101", "00001", "00001"))
  // vertical-stem vowels (right of the initial): bar + ticks
  private val VR: Map[Char, Seq[String]] = Map(
    'ㅏ' -> Seq("10", "10", "11", "10", "10"),
    'ㅓ' -> Seq("01", "01", "11", "01", "01"))
  // horizontal-stem vowels (below the initial) — NO empty rows or
  // columns inside the bitmaps: placement is the paint region's job,
  // and an empty row would split the syllable into two line bands
  private val VB: Map[Char, Seq[String]] = Map(
    'ㅜ' -> Seq("11111", "00100", "00100"),
    'ㅡ' -> Seq("11111"))

  final case class Syllable(initial: Char, vowel: Char,
      fin: Option[Char])

  val Size = 16

  /** The composed glyph set: char → 16×16 bitmap rows. */
  val Glyphs: Seq[(Char, Array[Array[Boolean]])] = Seq(
    '한' -> Syllable('ㅎ', 'ㅏ', Some('ㄴ')),
    '국' -> Syllable('ㄱ', 'ㅜ', Some('ㄱ')),
    '어' -> Syllable('ㅇ', 'ㅓ', None),
    '스' -> Syllable('ㅅ', 'ㅡ', None),
    '파' -> Syllable('ㅍ', 'ㅏ', None),
    '크' -> Syllable('ㅋ', 'ㅡ', None)
  ).map { case (c, s) => c -> compose(s) }

  /** Nearest-neighbor paint of a jamo bitmap into a cell region. */
  private def paint(dst: Array[Array[Boolean]], rows: Seq[String],
      y0: Int, x0: Int, h: Int, w: Int): Unit = {
    val sh = rows.length; val sw = rows(0).length
    for (y <- 0 until h; x <- 0 until w)
      if (rows(y * sh / h)(x * sw / w) == '1')
        dst(y0 + y)(x0 + x) = true
  }

  /** Regions are laid out ADJACENT on BOTH axes: the segmenter splits
    * glyph boxes on fully-empty columns and line bands on fully-empty
    * rows, so a syllable block must contain neither (vertical-stem
    * vowels abut the initial on the right; horizontal-stem vowels abut
    * it below and span the full width; finals abut the vowel). */
  private def compose(s: Syllable): Array[Array[Boolean]] = {
    val g = Array.fill(Size, Size)(false)
    val horizontal = VR.contains(s.vowel) // vowel stands to the right
    (s.fin, horizontal) match {
      case (None, true) =>
        paint(g, J(s.initial), 2, 0, 12, 10)
        paint(g, VR(s.vowel), 0, 10, 16, 4)
      case (Some(f), true) =>
        paint(g, J(s.initial), 0, 0, 8, 10)
        paint(g, VR(s.vowel), 0, 10, 10, 4)
        paint(g, J(f), 10, 2, 6, 12)
      case (None, false) =>
        paint(g, J(s.initial), 0, 3, 9, 10)
        paint(g, VB(s.vowel), 9, 0, 3, 16)
      case (Some(f), false) =>
        paint(g, J(s.initial), 0, 3, 6, 10)
        paint(g, VB(s.vowel), 6, 0, 5, 16)
        paint(g, J(f), 11, 2, 5, 12)
    }
    g
  }

  /** Rasterize Hangul text at `scale` px per cell — same machine-set
    * page discipline as [[TemplateOcrEngine.renderText]] (2-cell glyph
    * gaps, 8-cell spaces, 4-cell margins). */
  def renderText(text: String, scale: Int): BufferedImage = {
    require(scale >= 1)
    val glyphs = Glyphs.toMap
    val widthCells = text.map {
      case ' ' => 8
      case _ => Size + 2
    }.sum + 8
    val img = new BufferedImage(widthCells * scale,
      (Size + 8) * scale, BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(java.awt.Color.WHITE)
    gfx.fillRect(0, 0, img.getWidth, img.getHeight)
    gfx.setColor(java.awt.Color.BLACK)
    var cx = 4
    text.foreach {
      case ' ' => cx += 8
      case ch =>
        glyphs.get(ch).foreach { rows =>
          for (r <- 0 until Size; c <- 0 until Size if rows(r)(c))
            gfx.fillRect((cx + c) * scale, (4 + r) * scale, scale, scale)
        }
        cx += Size + 2
    }
    gfx.dispose()
    img
  }
}

/** Deterministic in-repo trainer for [[NeuralOcrEngine]]'s glyph MLP
  * (145 inputs — 12×12 gray coverage + the box-aspect feature that
  * separates 'O' from '0' — → 128 ReLU → |Labels| softmax):
  * cross-entropy SGD over glyphs rendered with the container's real
  * DejaVu families at several sizes (via java.awt, anti-aliased) plus
  * the [[HangulFont]] raster set, with seeded noise/contrast
  * augmentation. The forward is the exact op chain the exported graph
  * executes (MatMul→Add→Relu→MatMul→Add→Softmax). */
object NeuralOcrTrain {

  val Hidden = 128
  val Seed = 4242L
  val Epochs = 45

  val LatinFonts = Seq("DejaVu Sans", "DejaVu Serif", "DejaVu Sans Mono",
    "DejaVu Sans Condensed")
  val LatinSizes = Seq(16, 18, 20, 24, 28, 32, 36, 40)
  val HangulScales = Seq(2, 3, 4, 5, 6)
  /** The raster set yields one base sample per scale vs 4 fonts × 8
    * sizes for Latin — replicate so per-class sample mass is
    * comparable (training noise/contrast augmentation de-duplicates
    * the copies). */
  val HangulRepeat = 6

  private val NIn = NeuralOcrEngine.Grid * NeuralOcrEngine.Grid + 1
  /** Outputs: one per label + the trailing JUNK (reject) class. */
  private def nOut = NeuralOcrEngine.Labels.length + 1

  /** Render one Latin/digit glyph with a real font; anti-aliased. */
  def renderAwt(ch: Char, fontName: String, sizePx: Int): BufferedImage = {
    val pad = sizePx
    val img = new BufferedImage(sizePx + 2 * pad, sizePx + 2 * pad,
      BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, img.getWidth, img.getHeight)
    g.setColor(java.awt.Color.BLACK)
    g.setRenderingHint(java.awt.RenderingHints.KEY_TEXT_ANTIALIASING,
      java.awt.RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    g.setFont(new java.awt.Font(fontName, java.awt.Font.PLAIN, sizePx))
    g.drawString(ch.toString, pad, pad + sizePx)
    g.dispose()
    img
  }

  /** Render a whole machine-set LINE with a real font (spec harness +
    * the honest statement of the recognition domain: printed text,
    * real typefaces, anti-aliased). Each glyph is rendered alone,
    * cropped to its INK bounds, and blitted with controlled gaps —
    * the segmenter separates boxes on empty columns and reads a gap
    * over 30% of line height as a SPACE, so inter-glyph gaps must sit
    * well under that and word gaps well over (font side bearings are
    * too irregular to guarantee either). */
  def renderAwtText(text: String, fontName: String,
      sizePx: Int): BufferedImage = {
    def inkCrop(img: BufferedImage): Option[BufferedImage] = {
      var x0 = img.getWidth; var x1 = -1; var y0 = img.getHeight
      var y1 = -1
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        if ((img.getRGB(x, y) & 0xff) < 200) {
          if (x < x0) x0 = x; if (x > x1) x1 = x
          if (y < y0) y0 = y; if (y > y1) y1 = y
        }
      if (x1 < 0) None
      else Some(img.getSubimage(x0, y0, x1 - x0 + 1, y1 - y0 + 1))
    }
    val glyphs: Seq[(Char, Option[BufferedImage])] = text.map {
      case ' ' => (' ', None)
      case ch => (ch, inkCrop(renderAwt(ch, fontName, sizePx)))
    }
    val gap = math.max(2, sizePx / 12)
    val space = sizePx
    val pad = sizePx / 2 + 4
    val width = 2 * pad + glyphs.map {
      case (' ', _) => space
      case (_, Some(gi)) => gi.getWidth + gap
      case _ => 0
    }.sum
    // baseline-align: drop each crop so bottoms line up (digits and
    // capitals share the baseline in these families)
    val maxH = glyphs.collect { case (_, Some(gi)) => gi.getHeight }.max
    val img = new BufferedImage(width, maxH + 2 * pad,
      BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, img.getWidth, img.getHeight)
    var x = pad
    glyphs.foreach {
      case (' ', _) => x += space
      case (_, Some(gi)) =>
        g.drawImage(gi, x, pad + (maxH - gi.getHeight), null)
        x += gi.getWidth + gap
      case _ =>
    }
    g.dispose()
    img
  }

  /** Segment one single-glyph render to its (coverage, aspect)
    * feature pair. None if segmentation found no single glyph. */
  def coverageOf(img: BufferedImage): Option[GlyphSegmenter.Glyph] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    GlyphSegmenter.segment(bos.toByteArray, NeuralOcrEngine.Grid,
      NeuralOcrEngine.Grid, 5, 7) match {
      case Right(lines) if lines.flatten.size == 1 =>
        Some(lines.flatten.head)
      case _ => None
    }
  }

  /** The deterministic labelled dataset: (features, classIdx) —
    * real-font renders, the Hangul raster set, and seeded noise blobs
    * for the JUNK class (so non-text ink REJECTS by classification,
    * not only by softmax threshold). */
  def dataset(): Array[(Array[Double], Int)] = {
    val out = Array.newBuilder[(Array[Double], Int)]
    def feats(g: GlyphSegmenter.Glyph): Array[Double] =
      NeuralOcrEngine.features(g.cov, g.aspect).map(_.toDouble)
    val latin = NeuralOcrEngine.Labels.takeWhile(c => !isHangul(c))
    for (c <- latin; f <- LatinFonts; s <- LatinSizes;
         g <- coverageOf(renderAwt(c, f, s)))
      out += ((feats(g), NeuralOcrEngine.Labels.indexOf(c)))
    for ((c, _) <- HangulFont.Glyphs; s <- HangulScales;
         g <- coverageOf(HangulFont.renderText(c.toString, s));
         _ <- 0 until HangulRepeat)
      out += ((feats(g), NeuralOcrEngine.Labels.indexOf(c)))
    // junk class: random blob coverages across the full density range
    // (sparse scatter THROUGH near-solid blocks — a dense inkblot
    // resamples to a near-full square, which must reject) and the
    // full aspect range
    val junk = NeuralOcrEngine.Labels.length
    val rng = new java.util.Random(Seed + 2)
    val grid = NeuralOcrEngine.Grid
    for (_ <- 0 until 256) {
      val density = 0.15 + rng.nextDouble() * 0.8
      val solid = rng.nextBoolean() // gray scatter vs binary blob
      val cov = Array.fill(grid, grid)(
        if (rng.nextDouble() < density) {
          if (solid) 0.7 + rng.nextDouble() * 0.3 else rng.nextDouble()
        } else 0.0)
      val aspect = 0.15 + rng.nextDouble() * 1.85
      out += ((NeuralOcrEngine.features(cov, aspect).map(_.toDouble),
        junk))
    }
    out.result()
  }

  private def isHangul(c: Char): Boolean = c >= '가' && c <= '힣'

  final case class Mlp(w1: Array[Array[Double]], b1: Array[Double],
      w2: Array[Array[Double]], b2: Array[Double])

  def initMlp(seed: Long): Mlp = {
    val rng = new java.util.Random(seed)
    Mlp(
      w1 = Array.fill(NIn)(Array.fill(Hidden)(
        rng.nextGaussian() / math.sqrt(NIn.toDouble))),
      b1 = new Array[Double](Hidden),
      w2 = Array.fill(Hidden)(Array.fill(nOut)(
        rng.nextGaussian() / math.sqrt(Hidden.toDouble))),
      b2 = new Array[Double](nOut))
  }

  def probs(m: Mlp, x: Array[Double]): Array[Double] = {
    val h = new Array[Double](Hidden)
    var j = 0
    while (j < Hidden) {
      var s = m.b1(j); var i = 0
      while (i < NIn) { s += x(i) * m.w1(i)(j); i += 1 }
      h(j) = math.max(s, 0.0); j += 1
    }
    val z = new Array[Double](nOut)
    var k = 0
    while (k < nOut) {
      var s = m.b2(k); var j2 = 0
      while (j2 < Hidden) { s += h(j2) * m.w2(j2)(k); j2 += 1 }
      z(k) = s; k += 1
    }
    val mx = z.max
    val es = z.map(v => math.exp(v - mx))
    val sum = es.sum
    es.map(_ / sum)
  }

  /** One SGD step of softmax cross-entropy; returns the loss. */
  private def step(m: Mlp, x: Array[Double], label: Int,
      lr: Double): Double = {
    // forward, keeping h
    val h = new Array[Double](Hidden)
    var j = 0
    while (j < Hidden) {
      var s = m.b1(j); var i = 0
      while (i < NIn) { s += x(i) * m.w1(i)(j); i += 1 }
      h(j) = math.max(s, 0.0); j += 1
    }
    val z = new Array[Double](nOut)
    var k = 0
    while (k < nOut) {
      var s = m.b2(k); var j2 = 0
      while (j2 < Hidden) { s += h(j2) * m.w2(j2)(k); j2 += 1 }
      z(k) = s; k += 1
    }
    val mx = z.max
    val es = z.map(v => math.exp(v - mx))
    val sum = es.sum
    val p = es.map(_ / sum)
    val loss = -math.log(math.max(p(label), 1e-12))
    // backward: dz = p − onehot
    val dh = new Array[Double](Hidden)
    k = 0
    while (k < nOut) {
      val dz = p(k) - (if (k == label) 1.0 else 0.0)
      var j2 = 0
      while (j2 < Hidden) {
        dh(j2) += dz * m.w2(j2)(k)
        m.w2(j2)(k) -= lr * dz * h(j2)
        j2 += 1
      }
      m.b2(k) -= lr * dz
      k += 1
    }
    j = 0
    while (j < Hidden) {
      if (h(j) > 0.0) {
        val d = dh(j)
        var i = 0
        while (i < NIn) { m.w1(i)(j) -= lr * d * x(i); i += 1 }
        m.b1(j) -= lr * d
      }
      j += 1
    }
    loss
  }

  /** Deterministic training run with seeded augmentation (gaussian
    * cell noise + contrast scaling — the anti-aliasing/threshold
    * variation the segmenter produces on real scans). */
  def train(seed: Long = Seed, epochs: Int = Epochs): Mlp = {
    val data = dataset()
    require(data.nonEmpty, "no training glyphs rendered")
    val m = initMlp(seed)
    val rng = new java.util.Random(seed + 1)
    var e = 0
    while (e < epochs) {
      val lr = 0.08 * (1.0 - e.toDouble / epochs)
      // seeded shuffle (Fisher–Yates on an index array)
      val idx = Array.tabulate(data.length)(identity)
      var i = idx.length - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val t = idx(i); idx(i) = idx(j); idx(j) = t
        i -= 1
      }
      idx.foreach { id =>
        val (x0, label) = data(id)
        val scale = 0.8 + 0.2 * rng.nextDouble()
        val x = x0.clone()
        var t = 0
        while (t < NIn - 1) { // coverage cells: contrast + noise, clamped
          x(t) = math.min(1.0, math.max(0.0,
            x(t) * scale + rng.nextGaussian() * 0.03))
          t += 1
        }
        // aspect feature: tiny jitter only — O vs 0 in proportional
        // fonts sit ~0.05 apart on this axis, so the jitter must stay
        // well under that gap or augmentation erases the discriminator
        x(NIn - 1) = math.max(0.05, x(NIn - 1) +
          rng.nextGaussian() * 0.008)
        step(m, x, label, lr)
      }
      e += 1
    }
    m
  }

  /** Export as the ONNX graph [[NeuralOcrEngine]] executes. */
  def modelBytes(m: Mlp): Array[Byte] = {
    import OnnxWrite._
    val pb = new PbW
    pb.int(1, 8)
    pb.msg(7) { g =>
      g.str(2, "ocr_glyph_mlp")
      g.msg(1)(node("MatMul", Seq("x", "w1"), Seq("h0")))
      g.msg(1)(node("Add", Seq("h0", "b1"), Seq("h1")))
      g.msg(1)(node("Relu", Seq("h1"), Seq("h2")))
      g.msg(1)(node("MatMul", Seq("h2", "w2"), Seq("z0")))
      g.msg(1)(node("Add", Seq("z0", "b2"), Seq("z1")))
      g.msg(1)(node("Softmax", Seq("z1"), Seq("p"), Map("axis" -> -1L)))
      g.msg(5)(tensorRaw("w1", Seq(NIn, Hidden),
        m.w1.flatten.map(_.toFloat)))
      g.msg(5)(tensorRaw("b1", Seq(Hidden), m.b1.map(_.toFloat)))
      g.msg(5)(tensorRaw("w2", Seq(Hidden, nOut),
        m.w2.flatten.map(_.toFloat)))
      g.msg(5)(tensorRaw("b2", Seq(nOut), m.b2.map(_.toFloat)))
      g.msg(11)(valueInfo("x"))
      g.msg(12)(valueInfo("p"))
    }
    pb.toBytes
  }

  def trainedModelBytes(): Array[Byte] = modelBytes(train())

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0)
      else "src/main/resources/graft/ocr_glyph.onnx"
    val bytes = trainedModelBytes()
    java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
    println(s"wrote ${bytes.length} bytes to $out")
  }
}
