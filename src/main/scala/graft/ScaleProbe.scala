package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-telemetry probe (dev tool, not driver contract): the r13
  * measurements behind PLANS_r13 — connected-components rounds to
  * fixpoint on the real near-dup graph, and the semiPrune=on/off A/B
  * of the Jaccard verify corpus-side strategy — at whatever scale dir
  * is given (built for the GenData sf1 fixtures).
  *
  * {{{ SPARK_GRAFT_SF_DIR=testdata/sf1 sbt "runMain graft.ScaleProbe" }}}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.persist(); docs.count()

    // --- CC rounds at scale (r12 verdict item 7): rounds-to-fixpoint
    // on the REAL near-dup pair graph, not a synthetic chain
    val pairs = Dedup.minhashPairs(docs, k = 8, bands = 4, threshold = 0.5)
    val nGroups = time("nearDupGroups (full)")(
      Dedup.nearDupGroups(pairs).select(countDistinct(col("group_id"))).head.getLong(0))
    println(s"[scaleprobe] cc_rounds=${Dedup.lastRounds.get} n_groups=$nGroups")

    // --- semiPrune A/B (r12 verdict item 2): same query, conf flipped;
    // two reps each, best-of reported; equality of row counts asserted
    def runNgram(): Long = Dedup.ngramJaccard(docs, threshold = 0.5).count()
    val offCounts = (1 to 2).map(i => time(s"ngramJaccard semiPrune=off rep$i")(runNgram()))
    spark.conf.set(Dedup.SemiPruneConf, "true")
    val onCounts = (1 to 2).map(i => time(s"ngramJaccard semiPrune=on rep$i")(runNgram()))
    spark.conf.unset(Dedup.SemiPruneConf)
    require(offCounts.toSet.size == 1 && offCounts.head == onCounts.head,
      s"semiPrune changed the result: off=$offCounts on=$onCounts")
    println(s"[scaleprobe] ngram_pairs=${offCounts.head}")

    spark.stop()
  }
}
