package graft.ingest

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** Shared page-segmentation front end for the raster OCR engines
  * ([[TemplateOcrEngine]], [[NeuralOcrEngine]]): binarize at the
  * mid-range threshold → line bands by row-ink projection → glyph
  * boxes by column-ink projection → area-weighted GRAY coverage
  * resample of each box onto a caller-chosen grid (exact fractional
  * pixel/cell overlap weights, so non-integer scales and anti-aliased
  * edges contribute partial darkness instead of vote flips).
  *
  * The engines differ only in the CLASSIFIER behind this front end
  * (5×7 template distance vs the trained MLP) — segmentation bugs fix
  * in one place and recognition domains stay comparable.
  */
object GlyphSegmenter {

  /** One segmented glyph: gray coverage on the requested grid plus the
    * geometry the engines use for punctuation, spacing and (neural
    * leg) the aspect feature — the square resample erases width/height
    * ratio, which is exactly what separates 'O' from '0' in real
    * fonts, so the box aspect travels alongside the coverage. */
  final case class Glyph(cov: Array[Array[Double]], spaceBefore: Boolean,
      subHeight: Boolean, wide: Boolean, aspect: Double)

  private def luminance(img: BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** Maximal true-runs of a boolean projection as (start, end). */
  def runs(p: Array[Boolean]): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var s = -1
    var i = 0
    while (i < p.length) {
      if (p(i) && s < 0) s = i
      if (!p(i) && s >= 0) { out += ((s, i - 1)); s = -1 }
      i += 1
    }
    if (s >= 0) out += ((s, p.length - 1))
    out.result()
  }

  /** Area-weighted gray coverage of box [x0..x1]×[y0..y1] on a
    * gridW×gridH grid, with soft binarization (full ink below
    * thr−band, none above thr+band, linear between). */
  def coverage(lum: Array[Array[Int]], lo: Int, hi: Int, thr: Int,
      x0: Int, x1: Int, y0: Int, y1: Int,
      gridW: Int, gridH: Int): Array[Array[Double]] = {
    val band = math.max(1, ((hi - lo) * 15) / 100)
    @inline def inkness(y: Int, x: Int): Double = {
      val v = lum(y)(x)
      if (v <= thr - band) 1.0
      else if (v >= thr + band) 0.0
      else (thr + band - v).toDouble / (2.0 * band)
    }
    val bw = (x1 - x0 + 1).toDouble
    val bh = (y1 - y0 + 1).toDouble
    val cov = Array.ofDim[Double](gridH, gridW)
    var gy = 0
    while (gy < gridH) {
      val ys = gy * bh / gridH; val ye = (gy + 1) * bh / gridH
      var gx = 0
      while (gx < gridW) {
        val xs = gx * bw / gridW; val xe = (gx + 1) * bw / gridW
        var s = 0.0; var wsum = 0.0
        var py = math.floor(ys).toInt
        while (py < ye) {
          val wy = math.min(ye, py + 1.0) - math.max(ys, py.toDouble)
          if (wy > 0) {
            var px = math.floor(xs).toInt
            while (px < xe) {
              val wx = math.min(xe, px + 1.0) - math.max(xs, px.toDouble)
              if (wx > 0) {
                s += wy * wx * inkness(y0 + py, x0 + px)
                wsum += wy * wx
              }
              px += 1
            }
          }
          py += 1
        }
        cov(gy)(gx) = if (wsum == 0) 0.0 else s / wsum
        gx += 1
      }
      gy += 1
    }
    cov
  }

  /** Decode + segment one raster page. Left = fail-soft reason (the
    * reference's fail-row contract); Right = lines of glyphs. */
  def segment(imageBytes: Array[Byte], gridW: Int, gridH: Int,
      minW: Int, minH: Int): Either[String, Seq[Seq[Glyph]]] = {
    if (imageBytes == null || imageBytes.isEmpty) return Left("empty image")
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(imageBytes))
      catch { case _: Exception => null }
    if (img == null) return Left("undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    if (w < minW || h < minH) return Left("image smaller than a glyph")
    val lum = Array.tabulate(h, w)((y, x) => luminance(img, x, y))
    var lo = 255; var hi = 0
    lum.foreach(_.foreach { v =>
      if (v < lo) lo = v; if (v > hi) hi = v
    })
    if (hi - lo < 32) return Left("no contrast (blank page)")
    val thr = (lo + hi) / 2
    @inline def ink(y: Int, x: Int): Boolean = lum(y)(x) < thr

    val rowHasInk = Array.tabulate(h)(y => (0 until w).exists(ink(y, _)))
    val bands = runs(rowHasInk)
    val lines = bands.map { case (y0, y1) =>
      val bandH = y1 - y0 + 1
      val colHasInk = Array.tabulate(w)(x =>
        (y0 to y1).exists(y => ink(y, x)))
      val boxes = runs(colHasInk)
      // a gap wider than 30% of the band height separates WORDS (the
      // renderer's inter-glyph gap is ~bandH/7, a space ~4·bandH/7)
      val spaceGap = math.max(1, (bandH * 3) / 10)
      var prevEnd = -1
      boxes.map { case (x0, x1) =>
        val spaceBefore = prevEnd >= 0 && x0 - prevEnd - 1 > spaceGap
        prevEnd = x1
        val glyphTop = (y0 to y1).find(y =>
          (x0 to x1).exists(x => ink(y, x))).getOrElse(y0)
        val glyphBot = (y0 to y1).reverse.find(y =>
          (x0 to x1).exists(x => ink(y, x))).getOrElse(y1)
        val gh = glyphBot - glyphTop + 1
        val gw = x1 - x0 + 1
        Glyph(
          cov = coverage(lum, lo, hi, thr, x0, x1, glyphTop, glyphBot,
            gridW, gridH),
          spaceBefore = spaceBefore,
          subHeight = gh * 100 <= bandH * 45,
          wide = gw * 2 >= gh * 4,
          aspect = gw.toDouble / gh)
      }
    }
    Right(lines)
  }
}
