package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for the Naive-Bayes classifier shape (dev
  * tool, not part of the driver contract): times
  * [[graft.operators.Classifier.nbTrainScore]] cold + steady on the
  * documents table of SPARK_GRAFT_SF_DIR and dumps the scored rows to
  * NB_PROBE_OUT (if set) so a rewrite can be diffed row-exactly
  * against the previous implementation's dump.
  */
object NbProbe {
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
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[nbprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.persist(); println(s"[nbprobe] docs: ${docs.count()}")

    time("nbTrainScore (cold)")(
      graft.operators.Classifier.nbTrainScore(docs).count())
    time("nbTrainScore (steady)")(
      graft.operators.Classifier.nbTrainScore(docs).count())
    sys.env.get("NB_PROBE_OUT").foreach { out =>
      graft.operators.Classifier.nbTrainScore(docs)
        .coalesce(1).write.mode("overwrite").parquet(out)
      println(s"[nbprobe] dumped to $out")
    }
    spark.stop()
  }
}
