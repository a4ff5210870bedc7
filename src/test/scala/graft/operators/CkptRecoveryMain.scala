package graft.operators

import org.apache.spark.sql.SparkSession

import graft.operators.Ckpt.CkptOps

/** Forked-JVM scenario for CkptRecoverySpec — a REAL multi-executor
  * cluster (`local-cluster[2,1,…]`: standalone master + 2 worker
  * processes in separate JVMs) where one executor is killed after an
  * iterative operator's plan-truncation checkpoint materialized:
  *
  *   - default `localCheckpoint` path: the dead executor's blocks are
  *     gone and the lineage is TRUNCATED — Spark cannot recompute, the
  *     re-consume fails (the documented 100×-scale fragility);
  *   - `spark.graft.reliableCheckpoint=true` path: blocks live as
  *     checkpoint FILES on fault-tolerant storage — the re-consume
  *     (and a full LPA run on the survivor topology) succeeds.
  *
  * Run as `CkptRecoveryMain <local|reliable>`; prints
  * `RESULT:<mode>:<survived>` for the spec to assert on. A separate
  * JVM because the suite's shared SparkContext is `local[4]` and a
  * JVM can hold only one context. */
object CkptRecoveryMain {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("local")
    val reliable = mode == "reliable"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1536]")
      .appName("ckpt-recovery")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", opens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.reliableCheckpoint", reliable.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    try {
      // wait for both executors to register (driver + 2)
      val deadline = System.currentTimeMillis() + 120000
      while (spark.sparkContext.getExecutorMemoryStatus.size < 3 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      require(spark.sparkContext.getExecutorMemoryStatus.size >= 3,
        "executors did not register")
      // an iterative-operator-shaped state: spread across BOTH
      // executors, then checkpoint-truncated (eager, like the
      // mid-iteration states the graph operators materialize)
      val state = spark.range(0, 200000, 1, 16).toDF("id")
        .graftCheckpoint(true)
      require(state.count() == 200000)
      // kill ONE executor (halt skips shutdown hooks — a hard loss,
      // the preemption/OOM shape); the task retries on the survivor
      val victim = spark.sparkContext.getExecutorMemoryStatus.keys
        .filterNot(_.contains("localhost")).toSeq // no-op filter, ids differ
      spark.sparkContext.parallelize(1 to 64, 64).foreach { _ =>
        if (org.apache.spark.SparkEnv.get.executorId == "0")
          Runtime.getRuntime.halt(9)
      }
      Thread.sleep(4000) // let the loss register with the master
      val survived =
        try {
          // re-consume the truncated state: localCheckpoint blocks on
          // the dead executor are unrecoverable; reliable files are
          val n = state.count()
          // and drive a REAL iterative operator through the same knob
          // on the post-loss cluster
          val edges = spark.range(0, 300).toDF("id").selectExpr(
            "id % 100 as a", "(id * 7 + 1) % 100 as b")
          val comms = Graph.labelPropagation(edges, rounds = 3).count()
          n == 200000 && comms > 0
        } catch {
          case e: Throwable =>
            System.err.println(s"[recovery] re-consume failed: " +
              e.getMessage.take(300))
            false
        }
      println(s"RESULT:$mode:$survived")
    } finally {
      try spark.stop() catch { case _: Throwable => }
    }
  }
}
