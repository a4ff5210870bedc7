package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PostingsSpec extends SparkSpec {
  import spark.implicits._

  test("vbyte codec round-trips sorted id arrays, including boundaries") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(127L, 128L, 16383L, 16384L, 2097151L, 2097152L),
      Array(0L, 1L, 2L, 3L),
      (0 until 1000).map(i => i.toLong * 37 + 5).toArray)
    cases.foreach { ids =>
      val enc = Postings.encodeSorted(ids)
      assert(Postings.decode(enc).toSeq == ids.toSeq)
    }
    // single small gaps take a single byte each
    val tight = (1000L to 1100L).toArray
    val enc = Postings.encodeSorted(tight)
    assert(enc.length == 2 + (tight.length - 1),
      "gap-1 postings must cost 1 byte each after the 2-byte head")
  }

  test("compressedBlocks: the aggregate's encoded blocks decode to the " +
      "exact posting sets, independent of partitioning") {
    val postings = Seq(
      ("a", 5L), ("a", 4100L), ("a", 4101L), ("a", 9000L),
      ("b", 1L), ("b", 2L), ("b", 3L))
      .toDF("term", "doc_id")
    val blocks = Postings.compressedBlocks(postings.repartition(5))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Postings.decode(r.getAs[Array[Byte]]("bytes")).toSeq).toMap
    assert(blocks(("a", 0L)) == Seq(5L))
    assert(blocks(("a", 1L)) == Seq(4100L, 4101L))
    assert(blocks(("a", 2L)) == Seq(9000L))
    assert(blocks(("b", 0L)) == Seq(1L, 2L, 3L))
  }

  test("stats byte accounting matches the real encoder byte-for-byte") {
    val docs = graft.Tables.documents(spark, SfDir)
    val postings = graft.search.TextSearch
      .buildPostings(docs, "doc_id", "text").select("term", "doc_id")
    val stats = Postings.stats(postings, 10).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val blocks = Postings.compressedBlocks(
        postings.filter(col("term").isin(stats.keys.toSeq: _*)))
      .groupBy("term")
      .agg(sum(length(col("bytes"))).as("actual"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    stats.foreach { case (term, predicted) =>
      assert(blocks(term) == predicted,
        s"term '$term': stats said $predicted B, encoder wrote ${blocks(term)} B")
    }
  }

  test("compression wins: vbyte bytes well under raw 8B/posting") {
    val docs = graft.Tables.documents(spark, SfDir)
    val postings = graft.search.TextSearch
      .buildPostings(docs, "doc_id", "text").select("term", "doc_id")
    val top = Postings.stats(postings, 5).collect()
    top.foreach { r =>
      assert(r.getLong(4) < r.getLong(3) / 2,
        s"${r.getString(0)}: ${r.getLong(4)} B should be < half of raw ${r.getLong(3)} B")
    }
  }
}
