package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text/string/hash functions (SURVEY.md §2.6, F1–F13) as pure
  * `org.apache.spark.sql.functions` compositions — codegen'd, no UDFs.
  *
  * Tokenization and hashing are deliberately md5-based so every operator
  * built on them (MinHash, SimHash, BM25, fingerprints) has an exact
  * DuckDB-SQL equivalent for the correctness oracle.
  */
object TextFunctions {

  /** F1 — newline normalize: `\r\n<digits>` → `\n`
    * (reference `backend/process/parsing.py:34,56-59`). */
  def normalizeNewlines(c: Column): Column =
    regexp_replace(c, "\\r\\n\\d+", "\n")

  /** F2 — strip image markers (`parsing.py:105`). */
  def stripImageMarkers(c: Column): Column =
    regexp_replace(c, "<!-- image -->", "")

  /** F1+F2 composed — the reference's page-content cleaning path. */
  def cleanText(c: Column): Column = stripImageMarkers(normalizeNewlines(c))

  /** F4 — join non-empty category levels with "," (`parsing.py:191-192`). */
  def joinCategories(cats: Column*): Column = concat_ws(",", cats: _*)

  /** F3 — context prefix prepended to each page (`parsing.py:190-193`). */
  def contextPrefix(stem: Column, cats: Column): Column =
    concat(lit("This page explains "), stem, lit(" that belongs to "),
      cats, lit(" categories.\n"))

  /** F9 — windows path normalize (`postgres.py:231`). */
  def normalizePath(c: Column): Column = translate(c, "\\", "/")

  /** F8 — path → category level i (1..4), "" when absent
    * (`parsing.py:266-276`). element_at on a split path, null-safed. */
  def categoryLevel(path: Column, level: Int): Column = {
    val parts = split(normalizePath(path), "/")
    // try_element_at: ANSI mode (Spark 4 default) makes plain element_at
    // THROW on out-of-bounds; the reference defaults missing levels to "".
    coalesce(try_element_at(parts, lit(level + 1)), lit("")) // skip root seg
  }

  /** F13 — filename stem (basename without last extension). */
  def pathStem(c: Column): Column =
    regexp_extract(normalizePath(c), "([^/]+?)(\\.[^./]*)?$", 1)

  /** Lowercase alnum tokens; empties removed. Matches the DuckDB oracle
    * `list_filter(string_split_regex(lower(t),'[^a-z0-9]+'), x -> x <> '')`.
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Token count (whitespace-word definition). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Overlapping token-window chunks — the RAG ingest primitive (split a
    * document into `size`-token windows advancing by `size - overlap`):
    * chunk i covers tokens [1 + i*step, i*step + size]. Pure array
    * algebra (sequence → slice → join), shuffle-free, mirrored 1:1 by a
    * DuckDB list comprehension. Empty docs produce an empty chunk array.
    */
  def chunkTokens(toks: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got size=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    when(size(toks) > 0,
      transform(sequence(lit(1), size(toks), lit(step)),
        s => array_join(slice(toks, s, lit(chunkSize)), " ")))
      .otherwise(typedLit(Array.empty[String]))
  }

  /** A BPE-ish sub-word proxy: count of alnum runs + punctuation marks —
    * an upper bound on byte-pair tokens used for budget estimates. */
  def bpeishTokenCount(c: Column): Column =
    (size(filter(split(c, "[^A-Za-z0-9]+"), t => t =!= "")) +
      length(regexp_replace(c, "[A-Za-z0-9\\s]", ""))).cast("long")

  /** Stable 60-bit hash of a string via md5 (first 15 hex chars). Fits a
    * signed long on both Spark (`conv(...,16,10)`) and DuckDB
    * (`('0x'||substr(md5(x),1,15))::UBIGINT`). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** PII scrub patterns (ordered: URLs first so an address inside a URL
    * is not half-redacted). Conservative RE2-compatible syntax so the
    * same strings run in Java regex AND DuckDB/RE2 — no lookarounds, no
    * \\b. Public so oracle SQL is generated from the same constants. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+"                                  -> "[URL]",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"   -> "[EMAIL]",
    "\\+?[0-9]{3}[-. ]?[0-9]{3,4}[-. ]?[0-9]{4}"        -> "[PHONE]")

  /** Training-data curation: redact emails/URLs/phone-shaped spans with
    * typed placeholders. Per-row, shuffle-free, codegen'd
    * `regexp_replace` chain. */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** Let-binding for column expressions: evaluate `e` ONCE and pass it to
    * `body` as a lambda variable. Spark has no `let`, but a one-element
    * array `transform` is exactly that. Crucial inside higher-order
    * functions: they run interpreted (no codegen subexpression
    * elimination), so an expression referenced inside a lambda is
    * re-evaluated at EVERY lambda invocation — e.g. un-bound shingles
    * re-ran the token regex split ~3×|shingles| times per row. */
  def bind(e: Column, body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /** Word n-gram shingles of size n over the token array; docs shorter
    * than n get []. Native expression — the HOF formulation dispatched
    * one interpreted lambda (doing n `element_at` probes) per shingle. */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftext.ShinglesExpr.shingles(toks, n)
}
