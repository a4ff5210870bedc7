package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** [[NeuralOcrEngine]] — recognition beyond the 38-glyph template
  * alphabet: real DejaVu typefaces (fonts the template engine cannot
  * read), the in-repo Hangul raster font (EasyOCR en+ko parity at the
  * seam, reference `parsing.py:37-41`), fail-soft contracts, and the
  * byte-determinism of the committed trained fixture. */
class NeuralOcrSpec extends AnyFunSuite {

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  // minimal classic-PDF wrapper around one DCTDecode raster (the same
  // scanned-page shape TemplateOcrSpec drives)
  private def rasterJpegPdf(jpegBytes: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def p(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    p("%PDF-1.4\n")
    val offs = Array.newBuilder[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offs += bos.size(); p(s"$n 0 obj\n"); body; p("endobj\n")
    }
    obj(1)(p("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(p("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"))
    obj(3)(p("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>\n"))
    obj(4) {
      p(s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
        s"/Filter /DCTDecode /Length ${jpegBytes.length} >>\nstream\n")
      bos.write(jpegBytes)
      p("\nendstream\n")
    }
    val content = s"q $w 0 0 $h 0 0 cm /Im0 Do Q"
    obj(5) {
      p(s"<< /Length ${content.length} >>\nstream\n$content\nendstream\n")
    }
    val xref = bos.size()
    p("xref\n0 6\n0000000000 65535 f \n")
    offs.result().foreach(o => p(f"$o%010d 00000 n \n"))
    p(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF")
    bos.toByteArray
  }

  test("golden scan OUTSIDE the template alphabet: a DCTDecode raster " +
      "PDF set in DejaVu Serif at a size never seen in training " +
      "recovers its pinned text through the extractor") {
    val img = NeuralOcrTrain.renderAwtText("INVOICE 2847 TOTAL 9315",
      "DejaVu Serif", 28) // size 28 ∉ LatinSizes
    val pdf = rasterJpegPdf(jpeg(img), img.getWidth, img.getHeight)
    val rows = PdfPageExtractor(ocr = NeuralOcrEngine)
      .extract("serif_scan.pdf", pdf)
    assert(rows.length == 1 && rows.head.error.isEmpty, rows.toString)
    assert(rows.head.text.trim == "INVOICE 2847 TOTAL 9315",
      s"got: '${rows.head.text.trim}'")
  }

  test("every trained font family and an unseen size recognize the " +
      "full Latin+digit alphabet with zero wrong letters " +
      "('?' is allowed, substitution is not)") {
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789"
    for (f <- NeuralOcrTrain.LatinFonts; s <- Seq(22, 28, 36)) {
      val got = NeuralOcrEngine.recognize(
        png(NeuralOcrTrain.renderAwtText(alphabet, f, s)))
      assert(got.isRight, s"$f@$s: $got")
      val text = got.toOption.get.replace("\n", " ")
      assert(text.length == alphabet.length, s"$f@$s: '$text'")
      val wrong = alphabet.zip(text).filter { case (e, a) =>
        a != '?' && a != e }
      assert(wrong.isEmpty, s"$f@$s substitutions: $wrong in '$text'")
      val unknowns = text.count(_ == '?')
      assert(unknowns <= 2, s"$f@$s too many rejections: '$text'")
    }
  }

  test("Hangul smoke (the reference's ko leg): the composed syllable " +
      "blocks round-trip at trained and unseen scales") {
    for (scale <- Seq(2, 3, 5)) { // 5 unseen
      val got = NeuralOcrEngine.recognize(
        png(HangulFont.renderText("한국어 스파크", scale)))
      assert(got == Right("한국어 스파크"), s"scale $scale: $got")
    }
  }

  test("a Hangul scanned-page PDF keeps the q31 document contract") {
    val img = HangulFont.renderText("한국어", 4)
    val pdf = rasterJpegPdf(jpeg(img), img.getWidth, img.getHeight)
    val rows = PdfPageExtractor(ocr = NeuralOcrEngine)
      .extract("ko_scan.pdf", pdf)
    assert(rows.length == 1 && rows.head.error.isEmpty, rows.toString)
    assert(rows.head.text.trim == "한국어")
  }

  test("fail-soft contracts match the seam: blank page, garbage " +
      "bytes, inkblots degrade to Left/'?' — never fabricated text") {
    val blank = new java.awt.image.BufferedImage(100, 100,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = blank.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 100, 100)
    g.dispose()
    assert(NeuralOcrEngine.recognize(png(blank)).isLeft)
    assert(NeuralOcrEngine.recognize(Array[Byte](1, 2, 3)).isLeft)
    assert(NeuralOcrEngine.recognize(Array.empty[Byte]).isLeft)
    // inkblot: a dense random blob is rejected, not hallucinated
    val blob = new java.awt.image.BufferedImage(60, 60,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = blob.createGraphics()
    g2.setColor(java.awt.Color.WHITE); g2.fillRect(0, 0, 60, 60)
    g2.setColor(java.awt.Color.BLACK)
    val rng = new java.util.Random(5L)
    for (_ <- 0 until 400)
      g2.fillRect(10 + rng.nextInt(40), 10 + rng.nextInt(40), 2, 2)
    g2.dispose()
    NeuralOcrEngine.recognize(png(blob)) match {
      case Right(t) => assert(t.forall(c => c == '?' || c == ' ' ||
        c == '.' || c == '-'), s"hallucinated: '$t'")
      case Left(_) => // also fine
    }
  }

  test("training is deterministic: the committed fixture is " +
      "byte-identical to a fresh retrain") {
    val bytes = NeuralOcrTrain.trainedModelBytes()
    val in = getClass.getResourceAsStream("/graft/ocr_glyph.onnx")
    assert(in != null)
    val committed = in.readAllBytes(); in.close()
    assert(java.util.Arrays.equals(bytes, committed),
      s"retrain ${bytes.length}B vs committed ${committed.length}B")
  }

  test("the Hangul font is honestly compositional: every glyph " +
      "decomposes into its jamo layout and glyphs are pairwise " +
      "distinct under the 12x12 coverage metric") {
    val covs = HangulFont.Glyphs.map { case (c, _) =>
      c -> NeuralOcrTrain.coverageOf(
        HangulFont.renderText(c.toString, 3)).get.cov.flatten
    }
    for ((a, ca) <- covs; (b, cb) <- covs if a < b) {
      val d = ca.zip(cb).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(d > 1.0, s"$a vs $b too close: $d")
    }
  }
}
