package graft.ingest

import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** [[TemplateOcrEngine]] — the real pure-JVM OCR leg: code-distance
  * guarantee, rasterize→recognize roundtrips (clean PNG at several
  * scales, lossy JPEG), and the full PDF pipeline (a DCTDecode
  * raster-only page recovers pinned text through the same extractor
  * call site that yields fail rows under [[NoOcr]]). */
class TemplateOcrSpec extends SparkSpec {

  private val AllGlyphs =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ\n0123456789 X.-X"

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
  private def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("template alphabet has minimum pairwise Hamming distance 5 " +
      "(accept threshold 2 is strictly inside half the code distance)") {
    val f = TemplateOcrEngine.Font.toSeq
    val dists = for {
      i <- f.indices; j <- (i + 1) until f.length
    } yield (f(i)._1, f(j)._1,
      (0 until 7).map(r => (0 until 5)
        .count(c => f(i)._2(r)(c) != f(j)._2(r)(c))).sum)
    val min = dists.minBy(_._3)
    assert(min._3 >= 5, s"glyphs ${min._1}/${min._2} too close: ${min._3}")
    assert(TemplateOcrEngine.MaxDist * 2 < min._3)
    // soft-coverage accept region stays inside the unique-nearest ball:
    // ||A-B||² = Hamming ≥ 5 for binary templates ⇒ accept < 5/4
    assert(TemplateOcrEngine.SoftAccept < min._3 / 4.0)
  }

  /** Anti-aliased fixture: hard-edge render downscaled by a NON-INTEGER
    * factor with bilinear interpolation — every glyph edge becomes gray
    * pixels and no cell boundary aligns with the pixel grid. */
  private def antialiased(img: java.awt.image.BufferedImage,
      factor: Double): java.awt.image.BufferedImage = {
    val w = math.max(1, math.round(img.getWidth * factor).toInt)
    val h = math.max(1, math.round(img.getHeight * factor).toInt)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.setRenderingHint(java.awt.RenderingHints.KEY_ANTIALIASING,
      java.awt.RenderingHints.VALUE_ANTIALIAS_ON)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  test("anti-aliased raster (bilinear non-integer downscale) still " +
      "recognizes every glyph exactly") {
    for (factor <- Seq(0.72, 0.56)) {
      val img = antialiased(
        TemplateOcrEngine.renderText(AllGlyphs, 5), factor)
      val got = TemplateOcrEngine.recognize(png(img))
      assert(got == Right(AllGlyphs), s"factor $factor: $got")
    }
  }

  test("low-confidence glyphs degrade to '?', never a wrong letter: " +
      "an inkblot square inside a line of text") {
    val img = TemplateOcrEngine.renderText("AB C", 4)
    // overwrite the 'C' box area with a solid square (matches no
    // template closely; nearest few are equidistant-ish -> no margin)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.BLACK)
    // the 'C' starts after "AB " = 2 + (5+1)*2 + 4 cells; stamp over it
    val cx = (2 + 6 * 2 + 4) * 4
    g.fillRect(cx, 2 * 4, 5 * 4, 7 * 4)
    g.dispose()
    val got = TemplateOcrEngine.recognize(png(img))
    assert(got.isRight)
    val txt = got.toOption.get
    assert(txt.startsWith("AB "), s"got: $txt")
    assert(txt.endsWith("?"), s"solid inkblot must be '?', got: $txt")
  }

  test("rasterize -> recognize roundtrip: every glyph, several scales") {
    for (scale <- Seq(2, 3, 5)) {
      val img = TemplateOcrEngine.renderText(AllGlyphs, scale)
      val got = TemplateOcrEngine.recognize(png(img))
      assert(got == Right(AllGlyphs), s"scale $scale: $got")
    }
  }

  test("JPEG survives: lossy re-encode still recognizes exactly") {
    val img = TemplateOcrEngine.renderText("GRAFT OCR 42", 4)
    assert(TemplateOcrEngine.recognize(jpeg(img))
      == Right("GRAFT OCR 42"))
  }

  test("blank and garbage payloads fail soft") {
    val blank = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = blank.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 64, 64); g.dispose()
    assert(TemplateOcrEngine.recognize(png(blank)).isLeft)
    assert(TemplateOcrEngine.recognize("not an image".getBytes).isLeft)
    assert(TemplateOcrEngine.recognize(Array.empty[Byte]).isLeft)
  }

  // ---- full pipeline: raster-only PDF → extractor → recognized text

  private def classicPdf(objects: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objects.zipWithIndex.map { case (body, i) =>
      val off = sb.length
      sb ++= s"${i + 1} 0 obj\n$body\nendobj\n"
      off
    }
    val xrefOff = sb.length
    sb ++= s"xref\n0 ${objects.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(o => sb ++= f"$o%010d 00000 n \n")
    sb ++= s"trailer\n<< /Size ${objects.length + 1} /Root 1 0 R >>\n"
    sb ++= s"startxref\n$xrefOff\n%%EOF"
    sb.toString.getBytes("ISO-8859-1")
  }

  private def rasterJpegPdf(jpegBytes: Array[Byte], w: Int, h: Int)
      : Array[Byte] = {
    val payload = new String(jpegBytes, "ISO-8859-1")
    classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
      s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
        s"/Filter /DCTDecode /Length ${payload.length} >>" +
        s"\nstream\n$payload\nendstream",
      "<< /Length 26 >>\nstream\nq 100 0 0 40 0 0 cm /Im1 Do Q\nendstream"))
  }

  test("scanned-page pipeline: a DCTDecode raster PDF page recovers " +
      "its pinned text; NoOcr keeps the fail-row contract") {
    val img = TemplateOcrEngine.renderText("INVOICE 2026-08 TOTAL 137.50", 4)
    val pdf = rasterJpegPdf(jpeg(img), img.getWidth, img.getHeight)
    val recognized = PdfPageExtractor(ocr = TemplateOcrEngine)
      .extract("scan.pdf", pdf)
    assert(recognized.exists(p =>
      p.text.contains("INVOICE 2026-08 TOTAL 137.50")),
      s"got: ${recognized.map(_.text)}")
    val failRows = PdfPageExtractor(ocr = NoOcr).extract("scan.pdf", pdf)
    assert(failRows.forall(_.error.isDefined))
  }

  test("golden ANTI-ALIASED scan: a bilinear-softened JPEG raster PDF " +
      "still recovers the pinned text") {
    val hard = TemplateOcrEngine.renderText("INVOICE 2026-08 TOTAL 137.50", 5)
    val soft = antialiased(hard, 0.64)
    val pdf = rasterJpegPdf(jpeg(soft), soft.getWidth, soft.getHeight)
    val recognized = PdfPageExtractor(ocr = TemplateOcrEngine)
      .extract("scan_aa.pdf", pdf)
    assert(recognized.exists(p =>
      p.text.contains("INVOICE 2026-08 TOTAL 137.50")),
      s"got: ${recognized.map(_.text)}")
  }
}
