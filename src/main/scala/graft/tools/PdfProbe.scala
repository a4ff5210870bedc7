package graft.tools

import java.nio.file.{Files, Paths}

import graft.ingest.PdfPageExtractor

/** Scratch PDF-extractor probe (not part of the driver contract):
  * page counts, error rows, and a text sample per file. */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args.take(1).toSeq else {
      val dir = Paths.get("/root/reference/backend/docs/uploaded/google_openpaper")
      val s = Files.list(dir)
      try {
        val b = Seq.newBuilder[String]
        s.forEach(p => if (p.toString.endsWith(".pdf")) b += p.toString)
        b.result().sorted
      } finally s.close()
    }
    val ex = PdfPageExtractor()
    files.foreach { f =>
      val t0 = System.nanoTime()
      val pages = ex.extract(f, Files.readAllBytes(Paths.get(f)))
      val ms = (System.nanoTime() - t0) / 1e6
      val fails = pages.filter(_.error.isDefined)
      println(s"== $f")
      println(s"   pages=${pages.length} fails=${fails.length} ms=$ms")
      fails.take(3).foreach(p => println(s"   FAIL p${p.page}: ${p.error.get}"))
      val samplePage = if (args.length > 1) args(1).toInt else 2
      pages.lift(samplePage - 1).foreach { p =>
        println(s"   -- page ${p.page} text (${p.text.length} chars) --")
        println(p.text.linesIterator.take(15).mkString("\n"))
      }
    }
  }
}
