package graft

import org.apache.spark.sql.SparkSession

/** Splits a query's bench cost into DataFrame-build (driver-side plan
  * construction + analysis) vs execution (`count()`, which pays
  * optimization + codegen + run) — dev tool for deciding whether the
  * suite's sub-second fixed costs are driver plan work or task work.
  * Usage: sbt "runMain graft.BuildExecProbe q_a q_b ..." (defaults to a
  * spread of small queries). Prints cold and steady samples.
  */
object BuildExecProbe {
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
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val steady = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      graft.operators.Residue.sweep(spark)
      val (b, e) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      println(f"[besplit] $n rep$rep build=$b%.3f exec=$e%.3f")
      if (rep == 2) steady(n) = (b, e)
    }
    val bsum = steady.values.map(_._1).sum
    val esum = steady.values.map(_._2).sum
    println(f"[besplit] STEADY TOTAL build=$bsum%.1f exec=$esum%.1f n=${steady.size}")
    steady.toSeq.sortBy(-_._2._1).take(40).foreach { case (n, (b, e)) =>
      println(f"[besplit] TOPBUILD $n build=$b%.3f exec=$e%.3f")
    }
    spark.stop()
  }
}
