package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Generic per-job wall-time probe (dev tool, not part of the driver
  * contract): runs each named query twice (cold, then steady after a
  * Residue sweep) and prints every Spark job the action submits with
  * its wall time and stage count — the measurement that tells fixed
  * stage machinery (broadcast builds, AQE sub-jobs, cache fills) apart
  * from real operator work. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProbe q_a q_b"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT/codegen warm

    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, Int)]
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(), j.stageIds.size)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, nStages) =>
          lines.synchronized {
            lines += f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  stages=$nStages"
          }
        }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_pq_search")
    for (n <- names; run <- Seq("cold", "steady")) {
      val mark = lines.size
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the async listener bus drain
      println(f"[jobprobe] $n ($run): $dt%.2f s, ${lines.size - mark} jobs")
      lines.synchronized(lines.drop(mark).toList).foreach(l => println(s"[jobprobe]   $l"))
      graft.operators.Residue.sweep(spark)
    }
    spark.stop()
  }
}
