package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.VBytePostingsAgg

/** Compressed posting-list storage for the inverted index — the
  * index-size lever every production search engine pulls (Lucene's
  * postings are delta + variable-byte/PFOR): doc ids in a posting
  * block are sorted, gap-encoded, and each gap spends 1 byte per 7
  * bits instead of a fixed 8 bytes. English-like corpora average
  * 1–2 bytes per posting — a 4–8× index-size reduction, which at
  * 100 TB is the difference between an index that fits hot storage
  * and one that doesn't.
  *
  * Block structure: postings are grouped by `(term, doc_id div
  * blockWidth)` — NO window over a term's full posting list (a hot
  * term's list is corpus-sized; its blocks are bounded by occupancy ≤
  * blockWidth and encode independently, which also gives block-level
  * skip pointers for free: `(block, min_id, n)` is the skip entry).
  * Encoding happens inside partial aggregation ([[VBytePostingsAgg]])
  * so compressed bytes, not raw longs, cross the shuffle.
  */
object Postings {

  /** Doc-id span covered by one block (block = doc_id div width). */
  val BlockWidth = 4096L

  // ---- JVM codec (storage layer) ----------------------------------------

  /** VByte: little-endian 7-bit groups, high bit = continuation. */
  private def append(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"vbyte encodes non-negatives, got $v0")
    var v = v0
    while (v >= 0x80L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a sorted, distinct id array: first id absolute, then gaps. */
  def encodeSorted(ids: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ids.length * 2)
    var prev = 0L
    var i = 0
    while (i < ids.length) {
      if (i == 0) append(out, ids(0))
      else {
        require(ids(i) > prev, s"ids must be sorted distinct at $i")
        append(out, ids(i) - prev)
      }
      prev = ids(i)
      i += 1
    }
    out.toByteArray
  }

  /** Decode back to the sorted id array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L
    var shift = 0
    var prev = 0L
    var first = true
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      acc |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) {
        val v = if (first) acc else prev + acc
        out += v
        prev = v
        first = false
        acc = 0L; shift = 0
      } else shift += 7
      i += 1
    }
    out.toArray
  }

  /** Bytes VByte spends on a non-negative value — the closed form the
    * stats query (and its SQL oracle) uses. */
  def byteLenCol(v: Column): Column =
    when(v < 128L, 1).when(v < (1L << 14), 2).when(v < (1L << 21), 3)
      .when(v < (1L << 28), 4).when(v < (1L << 35), 5).otherwise(9)

  // ---- DataFrame layer ---------------------------------------------------

  /** Compressed block table: (term, block, n, min_id, bytes). The skip
    * list is the (term, block, min_id, n) projection. `postings` needs
    * (term, doc_id) with distinct pairs. */
  def compressedBlocks(postings: DataFrame): DataFrame =
    postings
      .select(col("term"), col("doc_id"),
        expr(s"doc_id div $BlockWidth").as("block"))
      .groupBy("term", "block")
      .agg(
        count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"),
        VBytePostingsAgg.vbyteBlock(col("doc_id")).as("bytes"))

  /** Per-term compression stats over the BLOCKED layout (first id of a
    * block absolute, gaps within): postings count, block count, raw
    * vs VByte bytes, and the truncated-ppm compression ratio. The gap
    * computation windows over (term, block) — bounded by block
    * occupancy, never a term's full list. */
  def stats(postings: DataFrame, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("term", "block").orderBy("doc_id")
    val sized = postings
      .select(col("term"), col("doc_id"),
        expr(s"doc_id div $BlockWidth").as("block"))
      .withColumn("prev", lag(col("doc_id"), 1).over(w))
      .withColumn("b", when(col("prev").isNull,
        byteLenCol(col("doc_id")))
        .otherwise(byteLenCol(col("doc_id") - col("prev"))))
    sized.groupBy("term")
      .agg(
        count(lit(1)).as("n_postings"),
        countDistinct(col("block")).as("n_blocks"),
        (count(lit(1)) * 8L).as("raw_bytes"),
        sum(col("b").cast("long")).as("vbyte_bytes"))
      .withColumn("ratio_ppm",
        expr("(vbyte_bytes * 1000000) div raw_bytes"))
      .orderBy(col("n_postings").desc, col("term").asc)
      .limit(topN)
  }
}
