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
}
