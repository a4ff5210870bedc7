package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The OCR seam (S4's raster leg, reference `parsing.py:38-40`): the
  * SAME extractor call site must yield the reference's fail row with
  * [[NoOcr]] and a success row carrying recognized text with a plugged
  * engine — proving a real OCR binding is a drop-in third
  * implementation of [[OcrEngine]] with no caller changes. */
class OcrSpec extends SparkSpec {

  /** Assemble a classic-xref PDF from object bodies (1-based ids). */
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

  /** One-page PDF whose only content is an Image XObject with the
    * given payload (the scanned-page shape the reference routes to
    * OCR). */
  private def rasterOnlyPdf(payload: String): Array[Byte] =
    classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 8 " +
        s"/Length ${payload.length} >>\nstream\n$payload\nendstream",
      "<< /Length 24 >>\nstream\nq 10 0 0 10 0 0 cm /Im1 Do Q\nendstream"))

  /** One-page PDF with a plain text layer. */
  private def textPdf(text: String): Array[Byte] = {
    val content = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      s"<< /Length ${content.length} >>\nstream\n$content\nendstream"))
  }

  test("StubOcrEngine is deterministic and md5-derived") {
    val img = Array[Byte](1, 2, 3, 4)
    val a = StubOcrEngine.recognize(img)
    assert(a === StubOcrEngine.recognize(img.clone()))
    assert(a.exists(_.matches("""\[ocr-stub [0-9a-f]{16} 4B\]""")))
    assert(StubOcrEngine.recognize(Array.empty[Byte]).isLeft)
    assert(NoOcr.recognize(img).isLeft)
  }

  test("raster-only page: NoOcr keeps the fail-row contract; a plugged engine yields a success row with the recognized text") {
    val bytes = rasterOnlyPdf("abcd")

    val noOcr = PdfPageExtractor().extract("scan.pdf", bytes)
    assert(noOcr.length === 1)
    assert(noOcr.head.error.exists(_.contains("OCR not available")))
    assert(noOcr.head.text === "")

    val withOcr = PdfPageExtractor(ocr = StubOcrEngine)
      .extract("scan.pdf", bytes)
    assert(withOcr.length === 1)
    assert(withOcr.head.error.isEmpty)
    // the stub's text for exactly the image payload the Doc extracts
    val doc = new Pdf.Doc(bytes)
    val (_, res) = doc.pages.head
    val imgs = doc.rasterImages(res)
    assert(imgs.length === 1)
    assert(withOcr.head.text ===
      StubOcrEngine.recognize(imgs.head).toOption.get)
  }

  test("a text-layer page never consults the OCR engine") {
    // engine that would blow up if called: pages WITH text skip OCR
    object Bomb extends OcrEngine {
      def name = "bomb"
      def recognize(b: Array[Byte]): Either[String, String] =
        throw new IllegalStateException("OCR consulted on a text page")
    }
    val pages = PdfPageExtractor(ocr = Bomb)
      .extract("t.pdf", textPdf("Hello Seam"))
    assert(pages.head.error.isEmpty)
    assert(pages.head.text.contains("Hello Seam"))
  }

  test("OCR'd scanned PDF flows through enrich as a SUCCESS row in the q31 document schema") {
    val base = Files.createTempDirectory("ingest_ocr").toString
    Files.createDirectories(Paths.get(base, "scans"))
    Files.write(Paths.get(base, "scans/scan_doc.pdf"),
      rasterOnlyPdf("wxyz"))
    val e = Ingest.enrich(
      Ingest.explodePages(
        Ingest.scanBinaryFiles(spark, base, "*.pdf"),
        PdfPageExtractor(ocr = StubOcrEngine)),
      base)
    val row = e.head()
    assert(row.getAs[String]("status") === "success")
    // enrich prepends its category-context summary line (q31 contract);
    // the OCR text is the page body under it
    assert(row.getAs[String]("page_content").contains("[ocr-stub "))
    assert(row.getAs[String]("lv1_cat") === "scans")
    assert(row.getAs[String]("id").length === 36)
  }
}
