package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RecordLinkageSpec extends SparkSpec {

  private lazy val cust = Tables.customer(spark, SfDir)
  private def blk = substring(col("c_name"), 10, 7)

  test("pairs stay inside blocks, a<b, and respect the edit bound") {
    val pairs = RecordLinkage.linkPairs(cust, "c_custkey", "c_name",
      blk, "c_acctbal", maxEdit = 1, minScore = 0.0)
    assert(pairs.count() > 0)
    assert(pairs.filter(col("a") >= col("b")).count() === 0)
    assert(pairs.filter(col("edit_dist") > 1).count() === 0)
    // block containment: ids agree on the 7-digit prefix key
    val names = cust.select(col("c_custkey").as("a"),
      substring(col("c_name"), 10, 7).as("ka"))
    val withKeys = pairs.join(names, "a")
      .join(names.toDF("b", "kb"), "b")
    assert(withKeys.filter(col("ka") =!= col("kb")).count() === 0)
  }

  test("an oversized-block cap drops non-discriminative blocks entirely") {
    // cap below every block size ⇒ no candidate pairs at all
    val pairs = RecordLinkage.linkPairs(cust, "c_custkey", "c_name",
      blk, "c_acctbal", maxEdit = 1, minScore = 0.0, maxBlockSize = 3)
    assert(pairs.count() === 0)
  }

  test("golden records cover every multi-member entity exactly once") {
    val golden = RecordLinkage.goldenRecords(cust, "c_custkey", "c_name",
      blk, "c_acctbal", maxEdit = 1, minScore = 0.6)
    val rows = golden.collect()
    assert(rows.nonEmpty)
    // canonical = cluster label (min member) and members sum to corpus
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_id") === r.getAs[Long]("canonical_id"))
      assert(r.getAs[Long]("n_members") > 1)
    }
    // survivor value is a member's value: max ≥ mean = total/n
    rows.foreach { r =>
      assert(r.getAs[Double]("survivor_value") * r.getAs[Long]("n_members")
        >= r.getAs[Double]("total_value") - 1e-6)
    }
  }

  test("entities are edit-1 connected components: one per full block here") {
    // fixture names are Customer#NNNNNNNNN — within a 7-digit-prefix block
    // the last-2-digit grid is connected under edit distance 1, so each
    // block collapses to ONE entity
    val golden = RecordLinkage.goldenRecords(cust, "c_custkey", "c_name",
      blk, "c_acctbal", maxEdit = 1, minScore = 0.6)
    val nBlocks = cust.select(blk).distinct().count()
    assert(golden.count() === nBlocks)
  }
}
