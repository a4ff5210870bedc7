package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.functions.TextFunctions

/** Scratch profiling main (not part of the driver contract). */
object Explore {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    time("warmup count")(docs.count())
    println("docs partitions = " + docs.rdd.getNumPartitions)

    val shd = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col("text")), 3)).as("shd"))
    time("shd materialize")(shd.select(sum(size(col("shd")))).head())
    val ex = shd.filter(size(col("shd")) > 0)
      .select(col("doc_id"), size(col("shd")).as("n_sh"),
        explode(col("shd")).as("shingle"))
    time("explode")(ex.count())
    val grouped = ex.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"))))
        .as("ds"))
      .filter(size(col("ds")) >= 2)
    time("grouped")(grouped.count())
    time("jaccard full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05).count())
    time("jaccard again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05).count())
    time("minhash pairs")(Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
