package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated corpora for the packing layout invariants —
  * fixed seeds, each sample run through the real Spark plan. */
class PackingPropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(1042L + i)))

  /** Corpora of (doc_id, text) with wildly varying lengths, including
    * empty docs. */
  private val corpora: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    lens <- Gen.listOfN(n, Gen.oneOf(Gen.const(0), Gen.choose(1, 5),
      Gen.choose(60, 200)))
  } yield lens.zipWithIndex.map { case (l, i) =>
    (i.toLong, Seq.fill(l)("w").mkString(" "))
  }

  test("per-shard invariants hold on arbitrary corpora") {
    samples(corpora, 6).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val stats = Packing.packStats(docs, "doc_id", "text",
        nShards = 4, seqLen = 16).collect()
      val totalDocs = stats.map(_.getAs[Long]("n_docs")).sum
      assert(totalDocs === corpus.size.toLong)
      stats.foreach { r =>
        val tokens = r.getAs[Long]("total_tokens")
        val nSeqs  = r.getAs[Long]("n_seqs")
        val eff    = r.getAs[Double]("efficiency")
        assert(nSeqs === (tokens + 15) / 16, r.toString)
        if (tokens > 0) {
          assert(eff > 0.0 && eff <= 1.0, r.toString)
          // efficiency is exact: tokens / (nSeqs * 16) rounded
          assert(math.abs(eff - tokens.toDouble / (nSeqs * 16)) < 1e-6)
        }
        assert(r.getAs[Long]("n_split_docs") <= r.getAs[Long]("n_docs"))
      }
    }
  }

  test("offsets tile each shard exactly (no gaps, no overlaps) on arbitrary corpora") {
    samples(corpora, 6).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val lay = Packing.packedLayout(docs, "doc_id", "text", 4, 16)
        .select("shard", "start_off", "n_tokens")
        .collect()
        .groupBy(_.getLong(0))
      lay.values.foreach { rows =>
        // sort by (start, end) so zero-token docs (empty spans) order
        // deterministically before the doc sharing their start offset
        val spans = rows.map(r => (r.getLong(1), r.getLong(1) + r.getLong(2)))
          .sortBy(identity)
        spans.zip(spans.drop(1)).foreach { case ((_, e1), (s2, _)) =>
          assert(e1 === s2, "concatenation must be gap-free")
        }
        assert(spans.head._1 === 0L)
      }
    }
  }
}
