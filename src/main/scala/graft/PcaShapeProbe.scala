package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe behind the r17.4 q_embed_pca rework: times (and, with a
  * dump dir argument, writes `explain("formatted")` plans for) the two
  * per-action shapes of [[graft.operators.Similarity.pcaTopComponent]]'s
  * moments/iteration aggregates —
  *  - BEFORE: one keyless aggregation with 64 per-dim long sums + 64
  *    overflow-checked DECIMAL(38,0) sums (the r16 shape), whose
  *    codegen source assembly alone cost ~0.2–0.5 s per driver action
  *    at bench SF (2k vectors ⇒ ~2 ms of task work);
  *  - AFTER: posexplode → groupBy(dim) with ONE sum per moment — the
  *    summands (same longs, same per-row cast(dec), order-free sums)
  *    are identical, so the collected values are bit-for-bit equal.
  * Usage: sbt "runMain graft.PcaShapeProbe [dumpDir]"
  */
object PcaShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val dims = 64
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vArr = transform(col("embedding"),
      e => round(e.cast("double") * lit(1000000.0)).cast("long"))

    // BEFORE: the wide keyless aggregate (r16 moments shape)
    val moAggs = (0 until dims).flatMap(d => Seq(
      sum(col("varr").getItem(d)).as(s"s$d"),
      sum((col("varr").getItem(d) * col("varr").getItem(d)).cast(dec))
        .cast(dec).as(s"q$d"))) :+ count(lit(1)).as("nv")
    val wide = embs.select(vArr.as("varr")).agg(moAggs.head, moAggs.tail: _*)

    // AFTER: posexplode → groupBy(dim) (the r17.4 shape)
    val zeroPad = array(Array.fill(dims)(lit(0L)): _*)
    val narrow = embs
      .select(posexplode(zip_with(vArr, zeroPad, (v, _) => v)).as(Seq("dim", "v")))
      .filter(col("dim") < dims)
      .groupBy(col("dim"))
      .agg(sum(col("v")).as("s"),
        sum((col("v") * col("v")).cast(dec)).cast(dec).as("q"),
        count(lit(1)).as("nv"))

    args.headOption.foreach { dir =>
      val d = new java.io.File(dir); d.mkdirs()
      def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val w = new java.io.PrintWriter(new java.io.File(d, name))
        try w.write(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        finally w.close()
      }
      dump("q_embed_pca_moments_before.txt", wide)
      dump("q_embed_pca_moments_after.txt", narrow)
      println(s"[pcashape] plans written to $dir")
    }

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[pcashape] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (i <- 1 to 3) {
      timed(s"moments-wide $i") { wide.collect() }
      timed(s"moments-explode $i") { narrow.collect() }
    }
    // value equality of the two shapes on the fixture (order-free sums)
    val w0 = wide.collect().head
    val byDim = narrow.collect().map(r => r.getAs[Int]("dim") -> r).toMap
    val drift = (0 until dims).filter { d =>
      w0.getAs[Long](s"s$d") != byDim(d).getAs[Long]("s") ||
        w0.getAs[java.math.BigDecimal](s"q$d").compareTo(
          byDim(d).getAs[java.math.BigDecimal]("q")) != 0 ||
        w0.getAs[Long]("nv") != byDim(d).getAs[Long]("nv")
    }
    println(s"[pcashape] shape value drift dims: ${drift.size} (expect 0)")
    spark.stop()
  }
}
