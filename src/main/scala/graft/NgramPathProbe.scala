package graft

import org.apache.spark.sql.SparkSession

/** Same-session A/B of [[graft.operators.Dedup.ngramJaccard]]'s
  * direct-verify gate (dev tool, not part of the driver contract):
  * interleaved runs with [[graft.operators.Dedup.DirectVerifyConf]]
  * forcing each candidate path, so box drift cannot masquerade as a
  * code delta. r17.4 sizing evidence: at sf0.1 (5k docs) steady-state
  * direct ≈ 2.0–2.1 s vs blob ≈ 2.6–2.9 s; at 100k closed-vocab docs
  * the direct path without the forced-broadcast verify spilled past
  * 79 GB of disk (candidate rows carrying a side's full blob through
  * the second verify join's sort) while the blob path runs ~16 s —
  * the measurements behind DirectVerifyDocsDefault = 20k.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.NgramPathProbe"
  */
object NgramPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ngrampath] $name ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      graft.operators.Residue.sweep(spark)
    }
    for (i <- 1 to 5) {
      spark.conf.set(graft.operators.Dedup.DirectVerifyConf, "99000000")
      timed(s"ngram-direct $i") {
        SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
      }
      spark.conf.set(graft.operators.Dedup.DirectVerifyConf, "0")
      timed(s"ngram-blob $i") {
        SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
      }
    }
    spark.conf.unset(graft.operators.Dedup.DirectVerifyConf)
    spark.stop()
  }
}
