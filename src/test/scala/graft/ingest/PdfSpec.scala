package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the pure-JVM PDF parser: hand-assembled minimal
  * PDFs covering the syntax paths the committed reference PDFs (hybrid
  * xref + ObjStm + Flate) do NOT exercise — classic uncompressed xref
  * tables, literal-string escapes (nested parens, octal, line
  * continuations), hex strings, TJ kern-gap spacing, and /Differences
  * encoding tables. Every byte offset is computed, not guessed, so the
  * fixtures stay valid if edited. */
class PdfSpec extends AnyFunSuite {

  /** Assemble a classic-xref PDF from object bodies (1-based ids). */
  private def classicPdf(objects: Seq[String]): Array[Byte] = {
    val header = "%PDF-1.4\n"
    val sb = new StringBuilder(header)
    val offsets = objects.zipWithIndex.map { case (body, i) =>
      val off = sb.length
      sb ++= s"${i + 1} 0 obj\n$body\nendobj\n"
      off
    }
    val xrefOff = sb.length
    sb ++= s"xref\n0 ${objects.length + 1}\n"
    sb ++= "0000000000 65535 f \n"
    offsets.foreach(o => sb ++= f"$o%010d 00000 n \n")
    sb ++= s"trailer\n<< /Size ${objects.length + 1} /Root 1 0 R >>\n"
    sb ++= s"startxref\n$xrefOff\n%%EOF"
    sb.toString.getBytes("ISO-8859-1")
  }

  private def onePagePdf(content: String, fontExtra: String = ""): Array[Byte] =
    classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
      s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica $fontExtra >>",
      s"<< /Length ${content.length} >>\nstream\n$content\nendstream"))

  private val ex = PdfPageExtractor()

  test("classic xref + literal-string escapes decode exactly") {
    val content =
      """BT /F1 12 Tf 72 720 Td (Hello \(escaped\) \110i \\ there) Tj ET"""
    val pages = ex.extract("t.pdf", onePagePdf(content))
    assert(pages.length === 1 && pages.head.error.isEmpty)
    // \( \) parens, \110 octal = 'H', \\ backslash
    assert(pages.head.text === "Hello (escaped) Hi \\ there")
  }

  test("hex strings and TJ kern gaps: big negative kerns become spaces") {
    val content =
      "BT /F1 12 Tf 72 720 Td [<48656C6C6F> -300 <776F726C64> -50 (!)] TJ ET"
    val pages = ex.extract("t.pdf", onePagePdf(content))
    // -300 exceeds the word-gap threshold → space; -50 is a kern → none
    assert(pages.head.text === "Hello world!")
  }

  test("/Differences encoding remaps codes through the glyph-name table") {
    val content = "BT /F1 12 Tf 72 720 Td (AB) Tj ET"
    // code 65 ('A') renamed to 'bullet', 66 ('B') to 'z'
    val pdf = onePagePdf(content,
      "/Encoding << /Differences [65 /bullet /z] >>")
    val pages = ex.extract("t.pdf", pdf)
    assert(pages.head.text === "•z")
  }

  test("multi-page documents keep page order; ' operator breaks lines") {
    val c1 = "BT /F1 12 Tf (first page) Tj ET"
    val c2 = "BT /F1 12 Tf (line one) Tj (line two) ' ET"
    val pdf = classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 6 0 R >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 7 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      s"<< /Length ${c1.length} >>\nstream\n$c1\nendstream",
      s"<< /Length ${c2.length} >>\nstream\n$c2\nendstream"))
    val pages = ex.extract("t.pdf", pdf)
    assert(pages.map(_.page) === Seq(1, 2))
    assert(pages(0).text === "first page")
    assert(pages(1).text === "line one\nline two")
  }

  test("garbage bytes fail soft; truncated xref fails soft") {
    val garbage = ex.extract("g.bin", "not a pdf at all".getBytes("UTF-8"))
    assert(garbage.length === 1 && garbage.head.page === 0)
    assert(garbage.head.error.exists(_.contains("no startxref")))
    val pdf = onePagePdf("BT (x) Tj ET")
    val truncated = java.util.Arrays.copyOfRange(pdf, 0, pdf.length / 2)
    val pages = ex.extract("t.pdf", truncated)
    assert(pages.forall(p => p.error.isDefined || p.text.nonEmpty))
  }

  test("indirect /Length references resolve through the xref") {
    val content = "BT /F1 12 Tf (indirect length) Tj ET"
    val pdf = classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      s"<< /Length 6 0 R >>\nstream\n$content\nendstream",
      content.length.toString))
    val pages = ex.extract("t.pdf", pdf)
    assert(pages.head.text === "indirect length")
  }

  test("a reference cycle fails soft instead of overflowing the stack") {
    // 6 0 obj is `6 0 R` — a self-cycle; it is the page's /Contents, so
    // pageText must resolve it. Unbounded resolve() would recurse to
    // StackOverflowError (an Error — it used to escape the fail-soft
    // guard and kill the task); the depth bound turns it into null.
    val pdf = classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      "<< /Length 4 >>\nstream\nnope\nendstream",
      "6 0 R"))
    val pages = ex.extract("t.pdf", pdf)
    // no crash; the cyclic contents yield an empty page or a soft error
    assert(pages.nonEmpty)
    assert(pages.forall(p => p.error.isDefined || p.text.isEmpty))
  }

  test("two-object reference cycles and cyclic /Length fail soft") {
    val pdf = classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      // /Contents chain 5 -> 6 -> 5; /Length of a real stream also cyclic
      "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      "<< /Type /Font >>",
      "6 0 R",
      "5 0 R"))
    val pages = ex.extract("t.pdf", pdf)
    assert(pages.forall(p => p.error.isDefined || p.text.isEmpty))
  }

  test("pathological container nesting fails soft, not StackOverflowError") {
    // a content-free page whose /Contents object is 100k nested arrays:
    // parse aborts via the nesting guard with a catchable Exception
    val deep = "[" * 100000 + "]" * 100000
    val pdf = classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      "<< /Type /Font >>",
      deep))
    val pages = ex.extract("t.pdf", pdf)
    assert(pages.forall(p => p.error.isDefined || p.text.isEmpty))
  }

  test("damaged /Length falls back to a raw endstream scan") {
    val content = "BT /F1 12 Tf (damaged length) Tj ET"
    val pdf = classicPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      // /Length points at a non-numeric object → the scan finds endstream
      s"<< /Length 6 0 R >>\nstream\n$content\nendstream",
      "/NotANumber"))
    val pages = ex.extract("t.pdf", pdf)
    assert(pages.head.text === "damaged length")
  }
}
