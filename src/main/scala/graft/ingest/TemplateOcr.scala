package graft.ingest

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** A REAL, pure-JVM OCR engine (the third [[OcrEngine]] implementation
  * the seam was built for): binarize → segment lines and glyph boxes by
  * ink projection → area-weighted resample of each glyph box onto the
  * 5×7 template grid as GRAY coverage (scale-normalized — fractional
  * pixel/cell boundaries weighted exactly, so non-integer scales and
  * anti-aliased edges land as partial coverage rather than vote flips)
  * → nearest-template match in squared-L2 over coverage. Self-contained
  * (javax.imageio only — no model runtime, zero egress), deterministic,
  * and honest about scope: it recognizes machine-set text in its
  * 38-glyph alphabet (A–Z, 0–9, '.', '-', space) at any scale/margins,
  * through JPEG ringing, bilinear-resampled ANTI-ALIASED rasters, and
  * non-integer scaling. A neural engine (EasyOCR parity, reference
  * `parsing.py:37-41`) replaces it behind the same trait for
  * open-vocabulary scans.
  *
  * Recognition guarantees: the template alphabet has MINIMUM pairwise
  * Hamming distance 5 (pinned in TemplateOcrSpec). In the coverage
  * metric, templates are binary, so ‖A − B‖² = Hamming(A, B) ≥ 5; a
  * coverage vector within √[[SoftAccept]] < √5 / 2 of a template is
  * therefore nearer to it than to ANY other — the unconditional-accept
  * region. Noisier glyphs (heavier anti-aliasing) are accepted up to
  * [[SoftAcceptMargin]]'s distance only when the SECOND-best template
  * is at least [[MinMargin]] further — a confidence rule; otherwise
  * the glyph becomes '?' rather than a wrong letter, and a blank or
  * contrast-free image fails soft (Left), keeping the reference's
  * fail-row contract (`parsing.py:139-154`).
  */
object TemplateOcrEngine extends OcrEngine {

  val GlyphW = 5
  val GlyphH = 7
  /** Legacy Hamming bound (binary-vote era), kept as the documented
    * relation to the code distance: 2·MaxDist < minPairwise (5). */
  val MaxDist = 2
  /** Unconditional accept: squared-L2 coverage distance strictly below
    * minPairwise/4 = 1.25 ⇒ the nearest template is unique. */
  val SoftAccept = 1.2
  /** Margin-gated accept for noisier (anti-aliased) glyphs. */
  val SoftAcceptMargin = 3.5
  val MinMargin = 1.0

  /** 5×7 bitmaps, one string row per scanline, '1' = ink. */
  val Font: Map[Char, Seq[String]] = Map(
    '-' -> Seq("00000", "00000", "00000", "11111", "00000", "00000", "00000"),
    '.' -> Seq("00000", "00000", "00000", "00000", "00000", "01110", "01110"),
    '0' -> Seq("01110", "10011", "10011", "10101", "11001", "11001", "01110"),
    '1' -> Seq("00100", "01100", "10100", "00100", "00100", "00100", "11111"),
    '2' -> Seq("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    '3' -> Seq("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    '4' -> Seq("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    '5' -> Seq("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    '6' -> Seq("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    '7' -> Seq("11111", "00001", "00010", "00100", "00100", "01000", "01000"),
    '8' -> Seq("01110", "10001", "01010", "00100", "01010", "10001", "01110"),
    '9' -> Seq("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    'A' -> Seq("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    'B' -> Seq("11110", "01001", "01001", "01110", "01001", "01001", "11110"),
    'C' -> Seq("00111", "01000", "10000", "10000", "10000", "01000", "00111"),
    'D' -> Seq("11100", "10010", "10001", "10001", "10001", "10010", "11100"),
    'E' -> Seq("11111", "10000", "10000", "11100", "10000", "10001", "11111"),
    'F' -> Seq("11111", "10000", "10000", "11100", "10000", "10000", "10000"),
    'G' -> Seq("01110", "10001", "10000", "10111", "10011", "10001", "01111"),
    'H' -> Seq("10001", "10001", "10001", "11111", "10001", "10001", "10001"),
    'I' -> Seq("11111", "00100", "00100", "00100", "00100", "10101", "11111"),
    'J' -> Seq("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    'K' -> Seq("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    'L' -> Seq("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    'M' -> Seq("10001", "11011", "11111", "11111", "10101", "10001", "10001"),
    'N' -> Seq("10001", "11001", "11101", "10111", "10011", "10001", "10001"),
    'O' -> Seq("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    'P' -> Seq("11110", "10011", "10011", "11110", "10000", "10000", "10000"),
    'Q' -> Seq("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    'R' -> Seq("11110", "10001", "10001", "11110", "10100", "10010", "10011"),
    'S' -> Seq("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    'T' -> Seq("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    'U' -> Seq("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    'V' -> Seq("10001", "10001", "10001", "10001", "01010", "01010", "00100"),
    'W' -> Seq("10001", "10001", "10001", "10101", "10101", "11011", "10001"),
    'X' -> Seq("10001", "01010", "00100", "00100", "00100", "01010", "10001"),
    'Y' -> Seq("10001", "01010", "00100", "00100", "01000", "01000", "01000"),
    'Z' -> Seq("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
  )

  /** Full-height glyphs participate in template matching; sub-height
    * marks ('.', '-') classify by box geometry instead. */
  private val Templates: Map[Char, Seq[String]] =
    Font -- Seq('.', '-')

  def name = "template5x7"

  /** Segment via the shared front end ([[GlyphSegmenter]] — identical
    * binarize/band/box/coverage machinery, extracted verbatim), then
    * classify: sub-height marks geometrically ('.' vs '-' by aspect —
    * too few cells for template distances), full-height glyphs by
    * nearest template over 5×7 gray coverage. */
  def recognize(imageBytes: Array[Byte]): Either[String, String] =
    GlyphSegmenter.segment(imageBytes, GlyphW, GlyphH, GlyphW, GlyphH)
      .flatMap { lines =>
        val text = lines.map { glyphs =>
          val sb = new StringBuilder
          glyphs.foreach { g =>
            if (g.spaceBefore) sb.append(' ')
            sb.append(
              if (g.subHeight) { if (g.wide) '-' else '.' }
              else matchGlyph(g.cov))
          }
          sb.toString
        }.mkString("\n").trim
        if (text.isEmpty) Left("no glyphs found") else Right(text)
      }

  /** Nearest template by squared-L2 over the gray coverage under the
    * accept/margin rules (see class doc). */
  private def matchGlyph(cov: Array[Array[Double]]): Char = {
    var best = '?'
    var bestD = Double.MaxValue
    var secondD = Double.MaxValue
    Templates.foreach { case (ch, rows) =>
      var d = 0.0
      var r = 0
      while (r < GlyphH && d < secondD) {
        var c = 0
        while (c < GlyphW) {
          val t = if (rows(r)(c) == '1') 1.0 else 0.0
          val e = cov(r)(c) - t
          d += e * e
          c += 1
        }
        r += 1
      }
      if (d < bestD) { secondD = bestD; bestD = d; best = ch }
      else if (d < secondD) secondD = d
    }
    if (bestD <= SoftAccept ||
        (bestD <= SoftAcceptMargin && secondD - bestD >= MinMargin)) best
    else '?'
  }

  /** Companion rasterizer (fixture builder): stamp `text` with the
    * SAME templates at `scale` px per cell, 1-cell glyph gaps, 4-cell
    * spaces, a 2-cell margin — the machine-set page the engine is
    * scoped to. Used by OcrSpec to build golden raster PDFs; also the
    * honest statement of the recognition domain. */
  def renderText(text: String, scale: Int): BufferedImage = {
    require(scale >= 1)
    val lines = text.split("\n").toSeq
    val widthCells = lines.map(l => l.map {
      case ' ' => 4
      case _ => GlyphW + 1
    }.sum).max + 4
    val heightCells = lines.length * (GlyphH + 2) + 2
    val img = new BufferedImage(widthCells * scale, heightCells * scale,
      BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(java.awt.Color.WHITE)
    gfx.fillRect(0, 0, img.getWidth, img.getHeight)
    gfx.setColor(java.awt.Color.BLACK)
    lines.zipWithIndex.foreach { case (line, li) =>
      var cx = 2
      val cy = 2 + li * (GlyphH + 2)
      line.foreach {
        case ' ' => cx += 4
        case ch =>
          Font.get(ch).foreach { rows =>
            for (r <- 0 until GlyphH; c <- 0 until GlyphW
                 if rows(r)(c) == '1')
              gfx.fillRect((cx + c) * scale, (cy + r) * scale, scale, scale)
          }
          cx += GlyphW + 1
      }
    }
    gfx.dispose()
    img
  }
}
