package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The `spark.graft.reliableCheckpoint` knob under REAL executor loss
  * (closing the last documented 100×-scale risk): a forked JVM runs a
  * standalone `local-cluster[2,1,…]` — two executor PROCESSES — kills
  * one after an eager plan-truncation checkpoint, and re-consumes the
  * state. The default localCheckpoint path must FAIL (truncated
  * lineage + lost blocks are unrecoverable, which is exactly why the
  * knob exists) and the reliable path must SURVIVE, including a full
  * labelPropagation run on the post-loss cluster. See
  * [[CkptRecoveryMain]] for the scenario body. */
class CkptRecoverySpec extends AnyFunSuite {

  private def runScenario(mode: String): (Int, String) = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"),
      "graft.operators.CkptRecoveryMain", mode)
    val pb = new ProcessBuilder(cmd: _*)
    // the standalone Worker launches executor processes through the
    // Spark launcher, which needs a dist layout and, absent one, hunts
    // for sbt/maven "build directories" — point it at the installed
    // dist and pin the scala version so it never hunts
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); fail(s"$mode scenario timed out") }
    (p.exitValue(), out)
  }

  test("executor loss after a truncation checkpoint: localCheckpoint " +
      "state is unrecoverable, the reliable knob survives and runs " +
      "LPA on the post-loss cluster") {
    val (rcL, outL) = runScenario("local")
    assert(outL.contains("RESULT:local:false"),
      s"local mode should NOT survive (rc=$rcL):\n${outL.takeRight(2000)}")
    val (rcR, outR) = runScenario("reliable")
    assert(rcR == 0 && outR.contains("RESULT:reliable:true"),
      s"reliable mode should survive (rc=$rcR):\n${outR.takeRight(2000)}")
  }
}
