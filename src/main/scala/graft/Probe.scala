package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for dedup hot spots (dev tool, not part of
  * the driver contract).
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
    val ds = sh.select(col("doc_id").as("id"), explode(col("s")).as("shingle"))
    time("postings count")(ds.count())
    val dfreq = ds.groupBy(col("shingle")).agg(count(lit(1)).as("c"))
    time("dfreq")(dfreq.count())
    val ordered = ds.join(dfreq, "shingle")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("c"), col("shingle")))).as("ordered"))
    time("rarity sort")(ordered.count())
    val prefixes = ordered
      .select(col("id"),
        transform(
          slice(col("ordered"), lit(1),
            greatest(lit(1),
              (size(col("ordered")) - ceil(lit(0.5) * size(col("ordered"))) + 1).cast("int"))),
          e => e.getField("shingle")).as("prefix"))
      .select(col("id"), explode(col("prefix")).as("shingle"))
    prefixes.persist()
    time("prefixes")(prefixes.count())
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand.persist()
    time("candidates")(cand.count())
    time("full ngram")(Dedup.ngramJaccard(docs).count())
    time("full ngram again")(Dedup.ngramJaccard(docs).count())

    val sig = time("minhash sigs")(
      { val s = sh.select(col("doc_id"), Dedup.minhashSig(col("s"), 8).as("g")); s.count(); s })
    time("full minhash")(Dedup.minhashLsh(docs).count())
    time("full minhash again")(Dedup.minhashLsh(docs).count())
    spark.stop()
  }
}
