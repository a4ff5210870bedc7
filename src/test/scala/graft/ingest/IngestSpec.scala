package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.DeterministicEmbedder

class IngestSpec extends SparkSpec {

  private def mkTree(): String = {
    val base = Files.createTempDirectory("ingest").toString
    def w(rel: String, text: String): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, text.getBytes("UTF-8"))
    }
    w("cat1/sub1/doc_a.txt", "page one text\fpage two text")
    w("cat1/doc_b.txt", "single page<!-- image -->with marker")
    w("cat2/doc_c.txt", "another doc")
    w("cat2/skip.bin", "binary noise")
    base
  }

  test("scanBinaryFiles: recursive with glob (S1/S3/P5)") {
    val base = mkTree()
    val files = Ingest.scanBinaryFiles(spark, base, "*.txt")
    assert(files.count() === 3)
    assert(files.columns.contains("content"))
  }

  test("explodePages: one row per page, fail-soft extractor (S4)") {
    val base  = mkTree()
    val files = Ingest.scanBinaryFiles(spark, base, "*.txt")
    val pages = Ingest.explodePages(files, TextPageExtractor())
    assert(pages.count() === 4) // 2 + 1 + 1
    assert(pages.filter(col("status") === "success").count() === 4)

    val failing = new PageExtractor {
      def extract(path: String, content: Array[Byte]) =
        if (path.contains("doc_b")) throw new RuntimeException("boom")
        else TextPageExtractor().extract(path, content)
    }
    val safe = new PageExtractor {
      def extract(path: String, content: Array[Byte]) =
        try failing.extract(path, content)
        catch { case e: Exception => Seq(PageText(0, "", Some(e.getMessage))) }
    }
    val withFail = Ingest.explodePages(files, safe)
    assert(withFail.filter(col("status") === "fail").count() === 1)
    assert(withFail.count() === 4) // failed file still yields its row
  }

  test("markdown extractor: tab runs become tables, decode falls back, pages split") {
    val e = MarkdownPageExtractor()
    val page1 = "Intro line\ncol_a\tcol_b\tcol_c\n1\t2\t3\n4\t5\t6\nAfter."
    val page2 = "plain second page"
    val pages = e.extract("x.txt", s"$page1\f$page2".getBytes("UTF-8"))
    assert(pages.length === 2)
    val md = pages.head.text
    assert(md.contains("| col_a | col_b | col_c |"))
    assert(md.contains("| --- | --- | --- |"))
    assert(md.contains("| 4 | 5 | 6 |"))
    assert(md.startsWith("Intro line"))
    assert(md.endsWith("After."))
    assert(pages(1).text === "plain second page")
    // a lone delimited line is NOT a table (no data row)
    val single = e.extract("y.txt", "a\tb\nplain".getBytes("UTF-8")).head.text
    assert(!single.contains("| --- |"))
    // invalid UTF-8 decodes via Latin-1 instead of replacement chars
    val latin = e.extract("z.txt", Array[Byte]('c', 'a', 'f', 0xE9.toByte))
    assert(latin.head.text === "café")
    assert(latin.head.error.isEmpty)
  }

  test("enrich: categories from path, hashes, context prefix (F3/F5/F8)") {
    val base = mkTree()
    val pages = Ingest.explodePages(
      Ingest.scanBinaryFiles(spark, base, "*.txt"), TextPageExtractor())
    val e = Ingest.enrich(pages, base)
    val a = e.filter(col("filename") === "doc_a.txt")
      .orderBy("page").collect()
    assert(a.length === 2)
    assert(a(0).getAs[String]("lv1_cat") === "cat1")
    assert(a(0).getAs[String]("lv2_cat") === "sub1")
    assert(a(0).getAs[String]("lv3_cat") === "")
    assert(a(0).getAs[String]("page_content").startsWith(
      "This page explains doc_a that belongs to cat1,sub1 categories.\n"))
    assert(a(0).getAs[String]("hashed_filepath").length === 32)
    assert(a(0).getAs[String]("id").length === 36) // uuid
    val b = e.filter(col("filename") === "doc_b.txt").head()
    assert(!b.getAs[String]("page_content").contains("<!-- image -->"))
    assert(b.getAs[String]("lv2_cat") === "")
  }

  test("a scanned (raster-only) PDF page flows through enrich as a FAIL row in the document schema") {
    // hand-assembled one-page PDF whose only content is an Image
    // XObject — the shape the reference routes to OCR; here it must
    // become a status="fail" row that still carries the full enriched
    // schema (q31's columns), not silent empty success text
    val header = "%PDF-1.4\n"
    val objects = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 >>\n" +
        "stream\n \nendstream",
      "<< /Length 24 >>\nstream\nq 10 0 0 10 0 0 cm /Im1 Do Q\nendstream")
    val sb = new StringBuilder(header)
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

    val base = Files.createTempDirectory("ingest_scan").toString
    Files.createDirectories(Paths.get(base, "scans"))
    Files.write(Paths.get(base, "scans/scan_doc.pdf"),
      sb.toString.getBytes("ISO-8859-1"))

    val e = Ingest.enrich(
      Ingest.explodePages(
        Ingest.scanBinaryFiles(spark, base, "*.pdf"), PdfPageExtractor()),
      base)
    val row = e.head()
    assert(row.getAs[String]("status") === "fail")
    assert(row.getAs[String]("error").contains("no text layer"))
    assert(row.getAs[Int]("page") === 1)
    // the fail row still carries the full document schema
    assert(row.getAs[String]("lv1_cat") === "scans")
    assert(row.getAs[String]("hashed_filepath").length === 32)
    assert(row.getAs[String]("id").length === 36)
  }

  test("pipeline: end-to-end to partitioned parquet with embeddings (E1)") {
    val base = mkTree()
    val out  = Files.createTempDirectory("ingest_out").toString
    Ingest.pipeline(spark, base, out, DeterministicEmbedder(16),
      glob = "*.txt")
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    assert(back.select("lv1_cat").distinct().count() === 2) // partition col
    assert(back.head().getAs[Seq[Float]]("embeddings").length === 16)
    // partition pruning works on the category layout
    assert(Files.exists(Paths.get(out, "lv1_cat=cat1")))
  }
}
