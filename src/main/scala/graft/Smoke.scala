package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's smoke check: runs `SparkEntry.entry`
  * (flagship hybrid search on sf0.001) and prints the row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(10, 60)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
