package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-stage cost breakdown of q267's HITS plan (the VERDICT's "prove
  * the floor" alternative): mirrors PageRank.hitsBroadcast stage by
  * stage so a slow sf1 number is attributed, not guessed at.
  * Profiling tool, not a product surface. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()

    val edges = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("hub"), col("l_partkey").as("auth"))
    import graft.operators.Ckpt.CkptOps
    val e = t("e distinct+ckpt+count") {
      val d = edges.select(col("hub"), col("auth")).distinct()
        .graftCheckpoint(false)
      d.count(); d
    }
    val eByHub = t("eByHub repartition+persist+count") {
      val d = e.repartition(col("hub")).persist()
      d.count(); d
    }
    val eByAuth = t("eByAuth repartition+persist+count") {
      val d = e.repartition(col("auth")).persist()
      d.count(); d
    }
    val hubs = t("hubs distinct (off eByHub)") {
      val h = eByHub.select(col("hub")).distinct().graftCheckpoint(false)
      println(s"  nh=${h.count()}"); h
    }
    val nh = hubs.count()
    val micro = 1000000000000L
    def toMicro(dec12: org.apache.spark.sql.Column) =
      (dec12 * lit(micro)).cast("long")
    def microToDouble(c: org.apache.spark.sql.Column) =
      c.cast("double") / lit(micro.toDouble)
    def microTotalToDouble(c: org.apache.spark.sql.Column) = {
      // pad only when SHORTER (lpad truncates longer strings) — keep
      // in lockstep with PageRank.hitsBroadcast
      val s0 = c.cast("string")
      val s = when(length(s0) < 13, lpad(s0, 13, "0")).otherwise(s0)
      val n = length(s)
      concat(s.substr(lit(1), n - 12), lit("."), s.substr(n - 11, lit(12)))
        .cast("double")
    }
    def rescale(s12: org.apache.spark.sql.Column,
        t12: org.apache.spark.sql.Column) =
      toMicro(round(microToDouble(s12) / microTotalToDouble(t12), 12)
        .cast(DecimalType(28, 12)))
    var h = t("h0 collect") {
      val df = hubs.select(col("hub"),
        toMicro(round(lit(1.0) / nh, 12).cast(DecimalType(28, 12)))
          .as("hs12"))
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    }
    def authHalf(hdf: org.apache.spark.sql.DataFrame) = {
      val araw = eByAuth.join(broadcast(hdf), "hub")
        .groupBy("auth").agg(sum(col("hs12")).as("ar12"))
        .graftCheckpoint(false)
      val at = araw.agg(sum(col("ar12")).as("t12"))
      araw.crossJoin(broadcast(at))
        .select(col("auth"), rescale(col("ar12"), col("t12")).as("as12"))
    }
    for (i <- 1 to 2) {
      // sub-step attribution for round i
      val a = t(s"r$i.a authHalf build+materialize(count)") {
        val x = authHalf(h); x.count(); x
      }
      val hraw = t(s"r$i.b hub agg materialize") {
        val x = eByHub.join(broadcast(a), "auth")
          .groupBy("hub").agg(sum(col("as12")).as("hr12"))
          .graftCheckpoint(false)
        x.count(); x
      }
      val rows = t(s"r$i.c total+rescale+collect") {
        val ht = hraw.agg(sum(col("hr12")).as("t12"))
        hraw.crossJoin(broadcast(ht))
          .select(col("hub"), rescale(col("hr12"), col("t12")).as("hs12"))
          .collect()
      }
      h = t(s"r$i.d literal rebuild") {
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), h.schema)
      }
    }
    t("final auth half + noop write") {
      authHalf(h).select(col("auth").as("node"),
        round(microToDouble(col("as12")), 9).as("auth"))
        .orderBy(col("auth").desc, col("node")).limit(20)
        .write.mode("overwrite").format("noop").save()
    }
    // was the shuffle actually elided? explain WITHOUT the checkpoint
    // (a checkpoint hides its subtree behind an ExistingRDD scan)
    println("PLAN eByAuth-join-groupBy (no ckpt):")
    eByAuth.join(broadcast(h), "hub")
      .groupBy("auth").agg(sum(col("hs12")).as("ar12"))
      .explain("formatted")
    println("PARTITIONING eByAuth: " +
      eByAuth.queryExecution.executedPlan.outputPartitioning)
    spark.stop()
  }
}
