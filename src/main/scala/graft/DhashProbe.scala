package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.operators.{CachePool, Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the q_dhash_groups closed-alphabet attribution instead of
  * arguing it (r14 verdict item 4), and decomposes the query's cost so
  * the tail-squeeze work (item 5) aims at the real stage.
  *
  *  - `closed <dir>...` — the REAL query pipeline (synthetic media
  *    table, BMP third): per dir, wall + row counts for the dHash
  *    build, the near-pair join, and the CC groups (with
  *    rounds-to-fixpoint telemetry).
  *  - `open <dir>...` — the twin with VARIED image content: same doc
  *    universe and geometry, but pixel values from an xxhash-style mix
  *    of (id, x, y) instead of the linear `id*31 + y*w + x` ramp, so
  *    dHashes disperse the way a real photo corpus's do. Tests the
  *    SCALING.md claim that the closed fixture's super-linear step is
  *    band densification from correlated gradients, not the operator.
  *
  * Two reps per stage, best-of (the box's storm discipline); counts
  * printed so a run that got faster by computing less is self-evident.
  */
object DhashProbe {

  /** One BMP whose pixels are a per-(id,x,y) avalanche mix — the
    * "every image is a different photo" twin of
    * [[Multimodal.encodeSynthetic]]'s linear ramp. Geometry matches
    * `synthSpec` so block shapes and widths are identical.
    */
  def encodeDiverse(id: Long): Array[Byte] = {
    val w = (8 + id % 25).toInt
    val h = (8 + (id * 3) % 17).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = id * 0x9e3779b97f4a7c15L + y.toLong * 0xbf58476d1ce4e5b9L + x.toLong * 0x94d049bb133111ebL
        z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
        z ^= z >>> 27; z *= 0x94d049bb133111ebL
        z ^= z >>> 31
        img.setRGB(x, y, z.toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DhashProbe <closed|open> <dir>...")
    val mode = args.head
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import spark.implicits._

    def best(f: => Long): (Double, Long) =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        // stop the clock BEFORE cache teardown (r15 advice): the probe
        // attributes stage costs, and Bench's own discipline is that
        // unpersist/teardown runs outside the timed region
        val dt = (System.nanoTime() - t0) / 1e9
        CachePool.clear()
        (dt, n)
      }.minBy(_._1)

    def media(dir: String): DataFrame = mode match {
      case "closed" =>
        Multimodal.synthMediaTable(spark, dir,
          where = col("doc_id") % 3 === 1 && col("doc_id") % 25 =!= 0)
      case "open" =>
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 3 === 1 && col("doc_id") % 25 =!= 0)
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { ids =>
            ImageIO.setUseCache(false)
            ids.map(id => (id, encodeDiverse(id)))
          }.toDF("doc_id", "payload")
      case other => sys.error(s"unknown mode $other")
    }

    dirs.foreach { d =>
      val (tHash, nDocs) = best(Multimodal.dHash(media(d)).toDF().count())
      // isolate the downstream stages from the decode: near/groups run
      // on a probe-materialized hash table (explicit persist, outside
      // the CachePool so best()'s clear() can't drop it between reps)
      val hashes = Multimodal.dHash(media(d)).toDF().persist()
      hashes.count()
      val (tNear, nPairs) = best(Multimodal.dHashNearDup(hashes).count())
      val (tGrp, nGrouped) = best(Multimodal.dHashGroups(hashes).count())
      val rounds = Dedup.lastRounds.get
      if (sys.env.contains("GRAFT_CC_DEBUG")) {
        val t0 = System.nanoTime()
        val g = Multimodal.dHashGroups(hashes)
        val t1 = System.nanoTime()
        g.count()
        val t2 = System.nanoTime()
        g.count()
        val t3 = System.nanoTime()
        println(f"[dhashprobe] construct=${(t1 - t0) / 1e9}%.2f s " +
          f"count1=${(t2 - t1) / 1e9}%.2f s count2=${(t3 - t2) / 1e9}%.2f s")
        CachePool.clear()
      }
      hashes.unpersist()
      println(f"[dhashprobe] mode=$mode dir=$d docs=$nDocs pairs=$nPairs " +
        f"grouped=$nGrouped cc_rounds=$rounds hash=$tHash%.2f s near=$tNear%.2f s groups=$tGrp%.2f s")
    }
    spark.stop()
  }
}
