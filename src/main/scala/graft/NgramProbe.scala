package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-time probe for the r17 digest-blob ngram pipeline at
  * small SF (dev tool, not part of the driver contract): names every
  * Spark job a cold q_dedup_ngram run submits so the fixed stage
  * machinery (gate aggregate, cache fills, AQE sub-jobs) can be told
  * apart from candidate/verify work. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.NgramProbe"
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT/codegen warm

    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts(j.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          lines.synchronized {
            lines += f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $desc"
          }
        }
    })

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngramprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val run = args.headOption.getOrElse("cold")
    timed(s"q_dedup_ngram ($run)") {
      SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    }
    Thread.sleep(500) // let the async listener bus drain
    lines.foreach(l => println(s"[ngramprobe] $l"))
    graft.operators.Residue.sweep(spark)

    // steady-state second run separates JIT/class-load from per-run cost
    val starts2 = lines.size
    timed("q_dedup_ngram (steady)") {
      SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    }
    Thread.sleep(500)
    lines.drop(starts2).foreach(l => println(s"[ngramprobe] $l"))
    spark.stop()
  }
}
