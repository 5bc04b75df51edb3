package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hyperplane-LSH bucket-skew probe — the measurement behind the r17
  * bitextMineLsh rework (SCALING.md "LSH on clustered embeddings is
  * not uniform LSH"): for each fixture dir, computes the scaled band
  * width, the RAW and DISTINCT banded-candidate counts of the bitext
  * split, and the top band-bucket populations. On near-uniform
  * signatures candidates track ~targetBucketSize·n; on clustered
  * embeddings same-cluster vectors share FULL signatures, so bucket
  * population tracks cluster size at ANY band width and candidates
  * grow super-linearly — the raw/distinct ratio is the per-pair
  * multiplicity the first-agreeing-band join predicate eliminates.
  *
  *   sbt "runMain graft.BandSkewProbe /root/repo/testdata/sf2 /root/repo/testdata/sf4"
  */
object BandSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    for (dir <- args) {
      val e = spark.read.parquet(dir + "/embeddings.parquet")
        .filter(col("vec_id") < 200000L)
      val n = e.count()
      val bpb = Similarity.scaledBitsInt(n, targetBucketSize = 8, minBits = 4, maxBits = 16)
      def keys(df: org.apache.spark.sql.DataFrame, id: String) =
        df.select(col("vec_id").as(id),
            explode(Similarity.hyperplaneBandKeys(col("embedding"), 4, bpb, 64)).as("k"))
          .select(col(id), col("k.band").as("band"), col("k.bk").as("bk"))
      val a = keys(e.filter(col("label") < 5), "a_id")
      val b = keys(e.filter(col("label") >= 5), "b_id")
      val cand = a.join(b, Seq("band", "bk")).select(col("a_id"), col("b_id"))
      val t0 = System.nanoTime()
      val raw = cand.count()
      val dis = cand.distinct().count()
      println(f"[probe] $dir n=$n bpb=$bpb rawCand=$raw distinctCand=$dis " +
        f"mult=${raw.toDouble / dis}%.2f took=${(System.nanoTime() - t0) / 1e9}%.1f s")
      a.groupBy("band", "bk").count().orderBy(desc("count")).limit(3).collect()
        .foreach(r => println(s"[probe] topbucket $r (target 8)"))
    }
    spark.stop()
  }
}
