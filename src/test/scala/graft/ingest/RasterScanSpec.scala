package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** [[RasterScan]] — the scanned-page builder behind the oracled
  * neural-OCR ingest query (q355). Pins the EXACTNESS claim that
  * query's oracle depends on: the full A-Z0-9 alphabet round-trips
  * verbatim through render → JPEG → DCTDecode PDF →
  * [[PdfPageExtractor]] → [[NeuralOcrEngine]] at the query's
  * typeface/size, in varying neighbor contexts ('?' would break the
  * hash — unlike the recognition specs, NO fallback is tolerated
  * here), and so does the Hangul fixture string. */
class RasterScanSpec extends AnyFunSuite {

  private val ex = PdfPageExtractor(ocr = NeuralOcrEngine)

  test("every A-Z0-9 character round-trips EXACTLY at DejaVu Serif 28 " +
      "in six neighbor contexts (the q355 oracle's alphabet)") {
    val chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    for (ctx <- Seq("A%sA", "M%sM", "1%s1", "%s", "X%s", "%sX")) {
      val text = chars.map(c => ctx.format(c)).mkString(" ")
      val rows = ex.extract("p.pdf",
        RasterScan.latinScanPdf(text, "DejaVu Serif", 28))
      assert(rows.length == 1 && rows.head.error.isEmpty, rows.toString)
      assert(rows.head.text == text,
        s"ctx=$ctx\n want='$text'\n got ='${rows.head.text}'")
    }
  }

  test("the q355 page shapes round-trip exactly: a 'PAGE <id> <LANG>' " +
      "Latin page and the Hangul fixture page") {
    val latin = ex.extract("l.pdf",
      RasterScan.latinScanPdf("PAGE 40 EN", "DejaVu Serif", 28)).head
    assert(latin.error.isEmpty && latin.text == "PAGE 40 EN",
      latin.toString)
    val h = graft.SparkEntry.HangulScanText
    val hang = ex.extract("h.pdf", RasterScan.hangulScanPdf(h, 4)).head
    assert(hang.error.isEmpty && hang.text == h, hang.toString)
  }
}
