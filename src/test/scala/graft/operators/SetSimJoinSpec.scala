package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(docs: org.apache.spark.sql.DataFrame, tau: Double) = {
    // reference implementation: all-pairs exact jaccard over the same
    // distinct 3-shingle sets
    val elems = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col("text")), 3))).as("el"))
    val sets = elems.groupBy("doc_id")
      .agg(collect_set(col("el")).as("els"), count(lit(1)).as("n"))
    sets.as("l").crossJoin(sets.as("r"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .withColumn("inter", size(array_intersect(col("l.els"),
        col("r.els"))).cast("double"))
      .withColumn("j", col("inter") /
        (col("l.n") + col("r.n") - col("inter")))
      .filter(col("j") >= tau)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        round(col("j"), 6).as("jaccard"))
  }

  test("prefix-filtered join equals the naive exact join on the fixture") {
    val docs = graft.Tables.documents(spark, SfDir).limit(200)
    val fast = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.6)
      .orderBy("a", "b").collect().toSeq
    val slow = naive(docs, 0.6).orderBy("a", "b").collect().toSeq
    assert(fast.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      == slow.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    assert(slow.nonEmpty, "fixture must contain near-dup pairs ≥ 0.6")
  }

  test("exact duplicates are found at tau = 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 1.0)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(out.head.getDouble(2) == 1.0)
  }

  test("no false positives below the threshold") {
    val docs = Seq(
      (1L, "a b c d e f g h"),       // shingles abc bcd cde def efg fgh
      (2L, "a b c x y z q w")).toDF("doc_id", "text") // shares only abc
    assert(SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.5).count() == 0)
  }

  test("prefix index holds only the rare tail: postings shrink vs full") {
    val docs = graft.Tables.documents(spark, SfDir).limit(200)
    val elems = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col("text")), 3))).as("el"))
    val full = elems.count()
    // prefix rows at tau=0.6: |x| − ⌈0.6|x|⌉ + 1 ≈ 0.4|x| of each set
    val df = elems.groupBy("el").agg(count(lit(1)).as("df"))
    val ranked = elems.join(df, "el")
      .withColumn("len", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("el").asc)))
    val prefix = ranked
      .filter(col("r") <= col("len") - ceil(lit(0.6) * col("len")) + 1)
      .count()
    assert(prefix < full / 2,
      s"prefix postings ($prefix) should be well under full postings ($full)")
  }
}
