package graft.ingest

import java.io.ByteArrayOutputStream

/** Synthetic "scanned page" builder: renders text to a raster (real
  * java.awt typefaces for Latin, the composed [[HangulFont]] for
  * Korean), JPEG-encodes it, and wraps it as a classic single-page
  * DCTDecode PDF — byte-wise the shape a physical scanner produces and
  * exactly what [[PdfPageExtractor]] hands to an [[OcrEngine]] when
  * the page has no text layer. Used by the oracled neural-OCR ingest
  * query (each page's content is a pure function of row data, so the
  * oracle can reconstruct the expected recognition in SQL) and
  * reusable by specs.
  */
object RasterScan {

  def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal classic PDF around one DCTDecode raster. */
  def jpegPdf(jpegBytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
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

  /** Latin scanned page: awt-rendered text (real typeface) → JPEG →
    * single-page PDF. */
  def latinScanPdf(text: String, font: String, size: Int): Array[Byte] = {
    val img = NeuralOcrTrain.renderAwtText(text, font, size)
    jpegPdf(jpeg(img), img.getWidth, img.getHeight)
  }

  /** Hangul scanned page via the composed jamo raster font. */
  def hangulScanPdf(text: String, scale: Int): Array[Byte] = {
    val img = HangulFont.renderText(text, scale)
    jpegPdf(jpeg(img), img.getWidth, img.getHeight)
  }
}
