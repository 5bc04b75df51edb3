package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two SCALING.md super-linearity attributions instead of
  * arguing them (r13 verdict item 3 — "the last unproven sentence in
  * the 100 TB story"):
  *
  *  - `ngram <dir>...` — [[Dedup.ngramJaccard]] wall time + pair count
  *    per documents dir. Run against closed-vocab dirs it reproduces
  *    the known quadratic candidate growth; against `GenData ...
  *    openvocab` dirs it tests the claim that a power-law vocabulary
  *    keeps prefix shingles near-singleton and the operator ~linear.
  *  - `bitext <dir>...` — [[Similarity.bitextMineLsh]] per embeddings
  *    dir at the [[Similarity.scaledBits]] signature width (the
  *    documented production knob; the oracle twin pins 16 bits only
  *    for replay). Tests the claim that scaling the width with n holds
  *    the candidate join linear where the fixed width densifies.
  *
  * Two cold reps per point, best-of reported (the box's storm
  * discipline); counts printed so a run that got faster by computing
  * less is self-evident.
  */
object OpenVocabProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpenVocabProbe <ngram|bitext> <dir>...")
    val mode = args.head
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def best(f: => Long): (Double, Long) =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        graft.operators.CachePool.clear()
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    mode match {
      case "ngram" => dirs.foreach { d =>
        val docs = spark.read.parquet(s"$d/documents.parquet")
        docs.persist()
        val nDocs = docs.count()
        val vocabSize = docs
          .select(explode(split(col("text"), " ")).as("w"))
          .agg(countDistinct(col("w"))).head.getLong(0)
        val (sec, pairs) = best(Dedup.ngramJaccard(docs, threshold = 0.5).count())
        println(f"[vocabprobe] ngram dir=$d docs=$nDocs vocab=$vocabSize pairs=$pairs best=$sec%.2f s")
        docs.unpersist()
      }
      case "bitext" => dirs.foreach { d =>
        val e = spark.read.parquet(s"$d/embeddings.parquet")
        e.persist()
        val n = e.count()
        val bits = Similarity.scaledBits(n / 2)
        val (sec, pairs) = best(Similarity.bitextMineLsh(
          e.filter(col("label") < 5), e.filter(col("label") >= 5),
          bands = 4, bitsPerBand = bits,
          kNeigh = 4, marginPpmMin = 1010000L, dims = 64).count())
        println(f"[vocabprobe] bitext dir=$d vecs=$n bits=$bits pairs=$pairs best=$sec%.2f s")
        e.unpersist()
      }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
