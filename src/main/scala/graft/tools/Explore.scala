package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch plan-inspection main (not part of the driver contract).
  * Prints the formatted physical plan of selected registry queries. */
object Explore {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q03_top_orders", "q05_revenue_by_nation",
        "q24_knn_bruteforce", "q29_exact_match")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
