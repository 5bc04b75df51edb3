package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch operator-timing probe for dedup hot spots (dev tool, not part
  * of the driver contract): cold vs steady-state numbers separate Spark
  * job-scheduling overhead from real work at small SF.
  */
object Probe {
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
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.persist(); docs.count()

    val sh = time("docShingles")(
      { val d = Dedup.docShingles(docs); d.persist(); d.count(); d })
    time("minhash sigs")(
      sh.select(col("doc_id"), Dedup.minhashSig(col("s"), 8).as("g")).count())
    time("full ngram (cold)")(Dedup.ngramJaccard(docs).count())
    time("full ngram (steady)")(Dedup.ngramJaccard(docs).count())
    time("full minhash (cold)")(Dedup.minhashLsh(docs).count())
    time("full minhash (steady)")(Dedup.minhashLsh(docs).count())
    time("simhash")(Dedup.simhashBuckets(docs).count())
    spark.stop()
  }
}
