package graft
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(Dedup.LocalCcEdgesConf, "0")
    import spark.implicits._
    def rounds(name: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val m = Dedup.nearDupGroups(pairs).agg(max("group_id")).head.getLong(0)
      println(f"[ccprobe] $name rounds=${Dedup.lastRounds.get} wall=${(System.nanoTime()-t0)/1e9}%.1f s maxLabel=$m")
    }
    // pure chain 27k
    rounds("chain27k", (0L until 27000L).map(i => (i, i+1)).toDF("id_a","id_b"))
    // chain of 900 cliques of 30 (consecutive ids), adjacent cliques bridged
    val cliq = (0 until 900).flatMap { c =>
      val base = c.toLong * 30
      val intra = for (i <- 0 until 30; j <- i+1 until 30) yield (base+i, base+j)
      val bridge = if (c > 0) Seq((base - 1, base)) else Seq()
      intra ++ bridge
    }
    rounds("cliquechain", cliq.toDF("id_a","id_b"))
    spark.stop()
  }
}
