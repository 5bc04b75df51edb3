package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CollapseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    for (dir <- args) {
      val e = spark.read.parquet(dir + "/embeddings.parquet").filter(col("vec_id") < 200000L)
      val n = e.count()
      val bpb = Similarity.scaledBitsInt(n, targetBucketSize = 8, minBits = 4, maxBits = 16)
      val a = e.filter(col("label") < 5)
      val b = e.filter(col("label") >= 5)
      def keys(df: org.apache.spark.sql.DataFrame, id: String) =
        df.select(col("vec_id").as(id),
          explode(Similarity.hyperplaneBandKeys(col("embedding"), 4, bpb, 64)).as("k"))
          .select(col(id), col("k.band").as("band"), col("k.bk").as("bk"))
      val cand = keys(a, "a_id").join(keys(b, "b_id"), Seq("band", "bk"))
        .select(col("a_id"), col("b_id"))
      val t0 = System.nanoTime()
      val raw = cand.count()
      val dis = cand.distinct().count()
      println(f"[probe] $dir n=$n bpb=$bpb rawCand=$raw distinctCand=$dis took=${(System.nanoTime()-t0)/1e9}%.1f s")
      // bucket skew: top band-key populations per side
      val top = keys(a, "a_id").groupBy("band","bk").count().orderBy(desc("count")).limit(3).collect()
      top.foreach(r => println("[probe] topbucket " + r))
    }
    spark.stop()
  }
}
