package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.InferTermBucketFilter

import graft.SparkSpec
import graft.index.SearchIndex

/** The injected optimizer rule that teaches Catalyst the engine's
  * bucketing invariant (`term_bucket = md5_60(term) % 64`): a user
  * filtering the postings relation on `term` alone must partition-prune
  * to the matching bucket dirs without knowing the invariant exists. */
class InferTermBucketFilterSpec extends SparkSpec {

  private lazy val postingsDir = {
    val d = Files.createTempDirectory("itbf").toString + "/postings"
    val spark0 = spark
    import spark0.implicits._
    Seq("spark", "join", "merge", "sort", "window", "scan", "filter", "group")
      .zipWithIndex
      .toDF("term", "doc_id")
      .withColumn("term_bucket", SearchIndex.termBucket(col("term")))
      .repartition(col("term_bucket"))
      .write.partitionBy("term_bucket").parquet(d)
    d
  }

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ InferTermBucketFilter
    try f
    finally spark.experimental.extraOptimizations = before
  }

  test("term equality grows a term_bucket partition filter; scan prunes dirs") {
    val q = spark.read.parquet(postingsDir).filter(col("term") === "spark")
    withRule {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("term_bucket"),
        "no derived bucket predicate in:\n" + opt)
      val fmt = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pf = fmt.linesIterator.find(_.contains("PartitionFilters")).get
      assert(pf.contains("term_bucket"),
        "bucket predicate did not reach PartitionFilters: " + pf)
      // the derived bucket is the writer's bucket — rows still match
      val rows = q.collect()
      assert(rows.length === 1 &&
        rows.head.getAs[Int]("term_bucket") ===
          SearchIndex.termBucketOf("spark"))
    }
  }

  test("IN list derives the union of buckets; results identical to no-rule run") {
    val q = () => spark.read.parquet(postingsDir)
      .filter(col("term").isin("spark", "join", "absent"))
    val plain = q().collect().map(_.toString).sorted
    withRule {
      val pruned = q()
      val expected = Seq("spark", "join", "absent")
        .map(SearchIndex.termBucketOf).distinct.sorted
      val opt = pruned.queryExecution.optimizedPlan.toString
      expected.foreach(b => assert(opt.contains(b.toString), opt))
      assert(pruned.collect().map(_.toString).sorted === plain)
    }
  }

  test("rule is idempotent and leaves non-term filters alone") {
    withRule {
      val once = spark.read.parquet(postingsDir)
        .filter(col("term") === "merge").queryExecution.optimizedPlan
      // fixed-point: applying the rule to its own output changes nothing
      assert(InferTermBucketFilter(once) === once)
      // a filter on another column must not grow bucket predicates
      val other = spark.read.parquet(postingsDir)
        .filter(col("doc_id") > 3).queryExecution.optimizedPlan.toString
      assert(!other.contains("term_bucket IN"), other)
    }
  }

  test("disjunctive term predicates are NOT rewritten (soundness)") {
    withRule {
      // (term = x OR doc_id > 5): constraining buckets to x's would
      // drop doc_id-matched rows in other buckets
      val q = spark.read.parquet(postingsDir)
        .filter(col("term") === "spark" || col("doc_id") > 5)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("term_bucket IN"), opt)
      assert(q.count() >= 3)
    }
  }
}
