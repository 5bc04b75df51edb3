package graft

import org.apache.spark.sql.SparkSession

/** Isolates the driver-side cost of `spark.read.parquet` (file listing +
  * footer schema inference) per fixture table, repeated — the per-query
  * tax every builder pays before any plan is constructed. Dev tool.
  */
object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000L).count()

    val tables = Seq("documents", "events", "lineitem", "points", "vectors",
      "orders", "customer")
    for (t <- tables; rep <- 1 to 3) {
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists) {
        val t0 = System.nanoTime()
        val df = spark.read.parquet(p)
        val t1 = System.nanoTime()
        println(f"[readcost] $t rep$rep read=${(t1 - t0) / 1e9}%.3f cols=${df.columns.length}")
      }
    }
    // explicit-schema read (skips footer inference) vs inferred
    for (rep <- 1 to 3) {
      val p = s"$sfDir/events.parquet"
      val sch = spark.read.parquet(p).schema
      val t0 = System.nanoTime()
      spark.read.schema(sch).parquet(p)
      val t1 = System.nanoTime()
      println(f"[readcost] events-with-schema rep$rep read=${(t1 - t0) / 1e9}%.3f")
    }
    // and one analysis-heavy shape: 30 chained withColumns vs one select
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      var df = base
      (1 to 30).foreach(i => df = df.withColumn(s"c$i", col("value") * i))
      val t1 = System.nanoTime()
      val one = base.select(col("*") +: (1 to 30).map(i => (col("value") * i).as(s"c$i")): _*)
      val t2 = System.nanoTime()
      println(f"[readcost] chain30 rep$rep withColumn=${(t1 - t0) / 1e9}%.3f select=${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
