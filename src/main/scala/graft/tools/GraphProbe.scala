package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the iterative graph queries (not
  * part of the driver contract): decomposes q230-shaped work into
  * edge-build / setup / per-iteration costs so optimization effort
  * lands where the seconds are. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != 0L) jobNanos.addAndGet(System.nanoTime() - s)
        }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobs.get(); val n0 = jobNanos.get()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  jobs=${jobs.get() - j0}%3d inJob=${(jobNanos.get() - n0) / 1e9}%6.2f s")
      r
    }
    // warmup
    graft.Tables.lineitem(spark, dir).groupBy("l_returnflag").count().count()

    val li = graft.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 4 === 0)
    val e0 = graft.operators.Graph.basketEdges(li, "l_orderkey", "l_partkey")
    t("basketEdges count")(e0.count())
    t("basketEdges count again")(e0.count())
    // setup decomposition of the run() chain (bc path)
    locally {
      import graft.operators.Ckpt.CkptOps
      val ec = graft.operators.Ckpt(e0, eager = false)
      val sym = ec.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(ec.select(col("b").as("src"), col("a").as("dst")))
      val es = t("s1 sym ckpt") {
        sym.select(col("src"), col("dst")).graftCheckpoint(false) }
      val deg = t("s2 deg ckpt") {
        es.groupBy("src").agg(count(lit(1)).as("deg")).graftCheckpoint(false) }
      val n = t("s3 deg.count")(deg.count())
      val ew = t("s4 ew persist") {
        val j = es.join(broadcast(deg), "src")
        val p = j.repartition(col("dst")).persist()
        p.write.mode("overwrite").format("noop").save() // force materialize
        p
      }
      t("s5 iterate 5") {
        import org.apache.spark.sql.types.DecimalType
        val nodes = deg.select(col("src").as("node"))
        val init = nodes.select(col("node"),
          round(lit(1.0) / n, 12).cast(DecimalType(28, 12)).as("rank"))
        def step(r: org.apache.spark.sql.DataFrame) = {
          val contrib = ew
            .join(broadcast(r.withColumnRenamed("node", "src")), "src")
            .select(col("dst").as("node"),
              round(col("rank").cast("double") / col("deg").cast("double"), 12)
                .cast(DecimalType(28, 12)).as("c"))
          nodes.join(contrib.groupBy("node").agg(sum("c").as("s")),
              Seq("node"), "left")
            .select(col("node"),
              round(lit(0.15) / n +
                lit(0.85) * coalesce(col("s").cast("double"), lit(0.0)), 12)
                .cast(DecimalType(28, 12)).as("rank"))
        }
        graft.operators.IterState.iterate(init, 5)(step)
          .write.mode("overwrite").format("noop").save()
      }
      ew.unpersist(blocking = false)
    }
    val sym = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
    t("pagerank 1 iter") {
      graft.operators.PageRank.run(sym, iters = 1, damping = 0.85)
        .write.mode("overwrite").format("noop").save()
    }
    t("pagerank 5 iters") {
      graft.operators.PageRank.run(sym, iters = 5, damping = 0.85)
        .write.mode("overwrite").format("noop").save()
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    t("full q230") {
      graft.SparkEntry.queries("q230_pagerank")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
