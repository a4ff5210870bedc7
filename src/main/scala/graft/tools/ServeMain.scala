package graft.tools

import org.apache.spark.sql.SparkSession

/** Run the serving layer standalone (the reference's
  * `uvicorn server:app` + Streamlit pair in one process): the JSON
  * API and the embedded browser UI on one port.
  *
  * Usage: tools/run_main.sh graft.tools.ServeMain [port] [baseDir]
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8000)
    val base = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_serve_").toString)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new graft.serve.GraftServer(spark, base, port = port)
    srv.start()
    println(s"[serve] http://127.0.0.1:${srv.boundPort}/  (base: $base)")
    Thread.currentThread().join() // serve until killed
  }
}
