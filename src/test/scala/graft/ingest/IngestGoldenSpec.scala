package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Golden-file pin against the reference's OWN committed parse outputs
  * (the .pkl files under `/root/reference/backend/docs/parsed/google_openpaper/`, 303
  * Docling-parsed pages across 5 PDFs, extracted to
  * `src/test/resources/golden/google_openpaper.jsonl`). No PDF codec
  * exists in this build, so the page CONTENT is taken as given — what
  * these tests pin is that every metadata/cleaning contract this engine
  * implements (F1–F5, F8, F9, F13 and the full [[Ingest.enrich]]
  * composition) reproduces the reference's real-world outputs exactly,
  * not just the synthetic fixtures. */
class IngestGoldenSpec extends SparkSpec {

  private lazy val golden = {
    val url = getClass.getResource("/golden/google_openpaper.jsonl")
    assert(url != null, "golden fixture missing")
    spark.read.json(url.toString).cache()
  }

  test("md5 contracts: page content and filename hashes match the reference") {
    // F5 — the reference hashes page_content and filename with md5
    // (`backend/process/parsing.py:178-189`); same builtin here.
    val bad = golden.filter(
      md5(col("page_content")) =!= col("hashed_page_content") ||
        md5(col("filename")) =!= col("hashed_filename"))
    assert(bad.count() === 0)
    assert(golden.count() === 303)
  }

  test("F9 path normalize: native path -> stored filepath; hash is pre-normalization") {
    // The reference stores the forward-slash form but hashes the
    // OS-native (backslash) path (`backend/process/postgres.py:231`) —
    // the fixture carries both so the order of operations is pinned.
    val bad = golden.filter(
      TextFunctions.normalizePath(col("native_filepath")) =!= col("filepath") ||
        md5(col("native_filepath")) =!= col("hashed_filepath"))
    assert(bad.count() === 0)
  }

  test("F3/F4/F13 context prefix built from this engine's functions matches") {
    val prefix = TextFunctions.contextPrefix(
      TextFunctions.pathStem(col("filepath")),
      TextFunctions.joinCategories(col("lv1_cat")))
    val bad = golden.filter(!col("page_content").startsWith(prefix))
    assert(bad.count() === 0)
  }

  test("F1/F2 cleaning is idempotent on the reference's cleaned output") {
    // the reference applied its cleaning before committing the parse;
    // re-applying this engine's cleanText must be a no-op
    val bad = golden.filter(
      TextFunctions.cleanText(col("page_content")) =!= col("page_content"))
    assert(bad.count() === 0)
  }

  test("Ingest.enrich reproduces the reference's page_content end-to-end") {
    // strip the reference's context sentence to recover the raw page
    // body, run it back through enrich, and require byte-identical
    // page_content (prefix + cleaning + categories + hashing)
    val prefix = TextFunctions.contextPrefix(
      TextFunctions.pathStem(col("filepath")),
      TextFunctions.joinCategories(col("lv1_cat")))
    val withPre = golden
      .withColumn("pre", prefix)
      .select(col("filepath"), col("page").cast("int").as("page"),
        expr("substring(page_content, length(pre) + 1)").as("page_content"),
        lit(null).cast("string").as("error"), col("status"),
        col("page_content").as("want"),
        col("hashed_page_content").as("want_hash"))
    // enrich strips the drive-letter "scheme": D:/auto_vectordb/... →
    // /auto_vectordb/..., so the category base is the schemeless form
    val out = Ingest.enrich(withPre, "/auto_vectordb/backend/docs/uploaded")
    val bad = out.filter(col("page_content") =!= col("want") ||
      col("hashed_page_content") =!= col("want_hash") ||
      col("lv1_cat") =!= "google_openpaper" || col("lv2_cat") =!= "")
    assert(bad.count() === 0)
  }

  // ---- S4: the pure-JVM PDF codec against the reference's committed PDFs

  private val pdfDir = "/root/reference/backend/docs/uploaded/google_openpaper"
  private val committedPdfs = Seq(
    "Newwhitepaper_Operationalizing Generative AI on Vertex AI.pdf",
    "whitepaper_Embeddings & vector stores.pdf")

  private def collapse(s: String): String =
    s.replaceAll("\\s+", " ").trim

  private lazy val extracted: Map[String, Seq[PageText]] = {
    val ex = PdfPageExtractor()
    committedPdfs.map { name =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(pdfDir, name))
      name -> ex.extract(name, bytes)
    }.toMap
  }

  test("PdfPageExtractor: page count matches the reference's Docling parse") {
    val goldenCounts = golden.groupBy("filename").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    committedPdfs.foreach { name =>
      val pages = extracted(name)
      assert(pages.count(_.error.isDefined) === 0,
        s"$name: ${pages.filter(_.error.isDefined).take(2)}")
      assert(pages.length.toLong === goldenCounts(name), name)
    }
  }

  test("PdfPageExtractor: per-page token coverage vs the Docling golden") {
    // the golden `page` is 0-based physical page; compare each golden
    // body's word set against the matching extracted page's
    def tokens(s: String): Set[String] =
      "[a-z]{4,}".r.findAllIn(s.toLowerCase).toSet
    committedPdfs.foreach { name =>
      val byPage = extracted(name).map(p => p.page -> p.text).toMap
      val rows = golden.filter(col("filename") === name)
        .select("page", "page_content").collect()
      val cov = rows.map { r =>
        val goldenBody = r.getString(1).split("categories\\.\n", 2).last
        val want = tokens(goldenBody)
        val got = tokens(byPage.getOrElse(r.getLong(0).toInt + 1, ""))
        if (want.isEmpty) 1.0
        else want.count(got.contains).toDouble / want.size
      }
      val mean = cov.sum / cov.length
      info(f"$name: mean token coverage ${mean * 100}%.1f%%, " +
        f"min ${cov.min * 100}%.1f%%")
      // measured 99.5% / 99.4% mean, 92.9% / 87.4% min (the min pages are
      // diagram-heavy; Docling OCRs figure labels this codec can't see)
      assert(mean >= 0.97, f"$name mean coverage ${mean * 100}%.1f%%")
      assert(cov.min >= 0.80, f"$name min coverage ${cov.min * 100}%.1f%%")
    }
  }

  test("PdfPageExtractor: pinned golden substrings appear in extracted text") {
    // literal sentences from the Docling golden, whitespace-collapsed
    val pins = Seq(
      ("whitepaper_Embeddings & vector stores.pdf", 6,
        "Techniques for storing, retrieving, and searching vast collections of embeddings"),
      ("whitepaper_Embeddings & vector stores.pdf", 6,
        "code snippets provide hands-on illustrations of key concepts"),
      ("Newwhitepaper_Operationalizing Generative AI on Vertex AI.pdf", 2,
        "Operationalizing Generative AI on Vertex AI"))
    pins.foreach { case (file, page, want) =>
      val got = collapse(extracted(file)
        .find(_.page === page).map(_.text).getOrElse(""))
      assert(got.contains(want), s"$file p$page missing: $want\nGOT: " +
        got.take(400))
    }
  }

  test("PdfPageExtractor: table-bearing golden pages reconstruct as markdown pipes") {
    // Docling (do_table_structure=True) renders these pages' tables as
    // pipe tables in the golden; the lattice heuristic must recover the
    // same SHAPE (pipe rows + separator) with the table's own cell text
    // (cell wrap/merge fidelity is the ML layout model's job, not pinned)
    val file = "whitepaper_Embeddings & vector stores.pdf"
    val text = extracted(file).find(_.page === 41).map(_.text).getOrElse("")
    val pipeRows = text.linesIterator.filter(_.startsWith("| ")).toVector
    assert(pipeRows.size >= 3,
      "no pipe table reconstructed on the table page:\n" + text.take(600))
    assert(text.contains("| ---"),
      "missing markdown separator row:\n" + pipeRows.take(3).mkString("\n"))
    // golden table's leading column entries appear as cell text
    assert(pipeRows.exists(r => r.contains("Retrieval")),
      pipeRows.take(6).mkString("\n"))
  }

  test("E1 pipeline end-to-end on the real PDFs: scan → parse → enrich → embed → write") {
    import graft.embed.DeterministicEmbedder
    val out = java.nio.file.Files.createTempDirectory("pdf_e1").toString
    val df = Ingest.pipeline(spark, pdfDir, out,
      DeterministicEmbedder(16), PdfPageExtractor(), glob = "*.pdf")
    val written = spark.read.parquet(out)
    // 69 + 52 pages, all parsed successfully, all embedded + enriched
    assert(written.count() === 121)
    assert(written.filter(col("status") =!= "success").count() === 0)
    assert(written.filter(size(col("embeddings")) =!= 16).count() === 0)
    assert(written.filter(col("page_content")
      .startsWith("This page explains ")).count() === 121)
    assert(df.columns.contains("hashed_page_content"))
  }

  test("MarkdownPageExtractor passes real markdown pages through unchanged") {
    // the golden bodies are already Docling markdown: re-extraction must
    // not mangle them (decode is strict UTF-8; no false table detection)
    val ex = MarkdownPageExtractor()
    val rows = golden.select("page_content").collect()
    rows.foreach { r =>
      val body = r.getString(0)
      val got = ex.extract("x.md", body.getBytes("UTF-8"))
      assert(got.length === 1)
      assert(got.head.text === body)
    }
  }
}
