package graft

/** Executor-loss recovery as a REGRESSION TEST (r15 verdict item 5):
  * FaultProbe's scenarios 2–3 — the reliable-checkpoint semiPrune path
  * recovering to the kill-free count, and catalog serving recovering
  * by lineage — were one-shot probes; this spec makes them part of
  * `sbt test` wherever a full Spark dist is available.
  *
  * Gating: `local-cluster` needs SPARK_HOME to spawn executor JVMs, so
  * the spec CANCELS cleanly when it is absent (plain laptops, CI
  * without a dist). A second SparkContext cannot share this JVM with
  * the suite's `local[*]` session, so the probe runs in a forked JVM
  * on the test classpath and the spec asserts on its scenario verdict
  * lines — the probe prints exactly one `[fault] <name>: PASS/FAIL…`
  * line per scenario and never masks an unexpected outcome.
  *
  * Scenario 1 (localCheckpoint loop EXPECTED to fail under executor
  * loss) stays probe-only: its verdict depends on the SIGKILL landing
  * mid-loop, which is timing-sensitive enough to flake a gate; the
  * must-HOLD recovery guarantees are scenarios 2–3.
  */
class FaultSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("semiPrune + catalog serving survive executor SIGKILL (local-cluster)") {
    assume(sys.env.contains("SPARK_HOME"),
      "SPARK_HOME not set — local-cluster cannot spawn executor JVMs")
    // sf0.1, the probe's own default: ngramJaccard's baseline there is
    // long enough that the SIGKILL lands mid-query (at sf0.01 the query
    // finishes before the kill thread fires and the pass is vacuous)
    val sfDir = sys.env.getOrElse("GRAFT_FAULT_SF_DIR", "/root/testdata/sf0.1")
    // cancel (like the SPARK_HOME gate), don't fail, on a box with a
    // Spark dist but no fixture — the forked probe would otherwise
    // crash reading parquet (r16 ADVICE)
    assume(new _root_.java.io.File(sfDir).isDirectory, s"fixture dir $sfDir missing")
    val java = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED")
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.FaultProbe", sfDir, "2,3")
    val out = new StringBuilder
    import scala.sys.process._
    // SPARK_SCALA_VERSION: the standalone worker's executor-command
    // builder calls getScalaVersion() even when SPARK_HOME/jars exists,
    // and a bare-jars dist has no launcher/target build dir to probe —
    // without the env var every executor launch dies with "Cannot find
    // any build directories" and the context stops before scenario 2
    val rc = Process(cmd, None,
      "SPARK_HOME" -> sys.env("SPARK_HOME"),
      "SPARK_SCALA_VERSION" -> "2.13")
      .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') },
        l => out.synchronized { out.append(l).append('\n') }))
    val text = out.toString
    assert(rc == 0, s"FaultProbe exited $rc:\n${text.takeRight(3000)}")
    def verdict(scenario: String): String =
      text.linesIterator.find(_.contains(s"[fault] $scenario:"))
        .getOrElse(fail(s"no verdict line for $scenario:\n${text.takeRight(3000)}"))
    val s2 = verdict("semiprune-reliable")
    assert(s2.contains("PASS"), s2)
    val s3 = verdict("catalog-serving")
    assert(s3.contains("PASS"), s3)
  }
}
