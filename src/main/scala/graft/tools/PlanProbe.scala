package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe (GraphProbe discipline). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch  = docs.filter(col("doc_id") % 2 === 1)
    val idx = graft.dedup.Dedup.substringHashIndex(corpus, "doc_id", "text", 8)
    t("index build")(println("  idx " + idx.count()))
    val spans = graft.dedup.Dedup.incrementalSubstringSpans(idx, batch,
      "doc_id", "text", 8)
    t("spans noop")(
      spans.orderBy("doc", "span_start").write.mode("overwrite")
        .format("noop").save())
    spark.stop()
  }
}
