package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.MvRewrite

import graft.SparkSpec
import graft.table.MaterializedView

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

class MvRewriteSpec extends SparkSpec {

  private val basePath = s"$SfDir/customer.parquet"

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ MvRewrite
    try f
    finally {
      spark.experimental.extraOptimizations = before
      MvRewrite.clear()
    }
  }

  private def registerMv(): String = {
    val mvPath = Files.createTempDirectory("mv_rw").toString
    MaterializedView.refresh(spark.read.parquet(basePath),
      "c_mktsegment", "c_acctbal").write.mode("overwrite").parquet(mvPath)
    MvRewrite.register(spark, basePath, mvPath, "c_mktsegment",
      "c_acctbal")
    mvPath
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }

  private def userAgg() = spark.read.parquet(basePath)
    .groupBy("c_mktsegment")
    .agg(count(lit(1)).as("n"),
      sum(col("c_acctbal").cast(
        org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
        .as("total"))

  test("a matching aggregate is answered from the MV, values identical") {
    val direct = userAgg().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .sortBy(_._1).toSeq
    withRule {
      val mvPath = registerMv()
      val df = userAgg()
      val paths = scanPaths(df)
      assert(paths.exists(_.contains(mvPath)),
        s"aggregate was not rewritten to the MV scan: $paths")
      assert(!paths.exists(_.contains("customer.parquet")),
        s"base table still scanned after rewrite: $paths")
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
        .sortBy(_._1).toSeq
      assert(got === direct)
    }
  }

  test("downstream operators keep working (ExprId preservation)") {
    withRule {
      registerMv()
      val top = userAgg().filter(col("n") > 0)
        .orderBy(col("total").desc).limit(2)
      assert(top.count() === 2)
    }
  }

  test("a filtered aggregate is NOT rewritten") {
    withRule {
      registerMv()
      val df = spark.read.parquet(basePath)
        .filter(col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(df).exists(_.contains("customer.parquet")),
        "filtered aggregate must read the base table")
    }
  }

  test("an aggregate on a different column is NOT rewritten") {
    withRule {
      registerMv()
      val df = spark.read.parquet(basePath)
        .groupBy("c_mktsegment")
        .agg(sum(col("c_custkey").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
          .as("s"))
      assert(scanPaths(df).exists(_.contains("customer.parquet")),
        "a sum over an unregistered column must not use the MV")
    }
  }

  test("unregistered sessions/paths are untouched") {
    withRule {
      // nothing registered: plan unchanged
      val df = userAgg()
      assert(scanPaths(df).exists(_.contains("customer.parquet")))
    }
  }

  test("a multi-path scan whose FIRST root is the registered base is NOT rewritten") {
    withRule {
      registerMv()
      // second path brings extra rows the MV knows nothing about —
      // substituting the MV would silently drop them
      val extra = Files.createTempDirectory("mv_rw_extra").toString
      spark.read.parquet(basePath).limit(5)
        .write.mode("overwrite").parquet(extra)
      val df = spark.read.parquet(basePath, extra)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
            .as("total"))
      assert(scanPaths(df).exists(_.contains("customer.parquet")),
        "multi-path aggregate must keep reading its base scans")
      // and the values include BOTH paths' rows
      val n = df.agg(sum("n")).head().getLong(0)
      assert(n === spark.read.parquet(basePath).count() + 5)
    }
  }

  test("a rewritten base table disables the stale MV (fingerprint check)") {
    withRule {
      // copy the base so the test can rewrite it
      val baseCopy = Files.createTempDirectory("mv_rw_base").toString
      spark.read.parquet(basePath).write.mode("overwrite").parquet(baseCopy)
      val mvPath = Files.createTempDirectory("mv_rw_mv").toString
      MaterializedView.refresh(spark.read.parquet(baseCopy),
        "c_mktsegment", "c_acctbal").write.mode("overwrite").parquet(mvPath)
      MvRewrite.register(spark, baseCopy, mvPath, "c_mktsegment",
        "c_acctbal")
      def agg() = spark.read.parquet(baseCopy)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(agg()).exists(_.contains(mvPath)),
        "fresh registration must rewrite")
      // rewrite the base in place: different rows, different file names
      spark.read.parquet(basePath).limit(10)
        .write.mode("overwrite").parquet(baseCopy)
      val after = agg()
      assert(scanPaths(after).exists(_.contains(baseCopy)),
        "stale MV served after the base was rewritten")
      assert(after.agg(sum("n")).head().getLong(0) === 10,
        "results reflect the OLD base snapshot")
    }
  }
}
