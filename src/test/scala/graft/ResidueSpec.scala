package graft

import graft.operators.{CachePool, Residue}
import org.apache.spark.sql.functions._

/** Pins the r15 driver-residue bound (r14 verdict item 1): broadcast
  * remnants and straggler cached plans accumulated across a suite of
  * independent queries are actually RECLAIMED by [[Residue.sweep]] —
  * block storage returns to (near) zero, so the protected storage pool
  * can never squeeze later queries' execution memory the way the sf1
  * 48 GB-heap workaround was masking.
  */
class ResidueSpec extends SparkSpec {
  import spark.implicits._

  test("sweep reclaims broadcast blocks and cached plans down to a fixed bound") {
    val dim = (0L until 2000L).map(i => (i, s"name$i")).toDF("k", "name")
    // leave residue the way a suite does: broadcast joins + a cached
    // frame dropped without unpersist, across several "queries"
    (1 to 6).foreach { i =>
      val fact = spark.range(200000).select(col("id").as("k"),
        (col("id") * i).as("v"))
      fact.join(broadcast(dim), Seq("k")).agg(sum(col("v"))).collect()
      val cached = fact.filter(col("v") % 7 === 0).cache()
      cached.count()
      CachePool.track(fact.select(col("k")))
    }
    val (before, max) = Residue.storageUsed(spark)
    assert(before > 0L, "fixture failed to leave any block-storage residue")
    assert(max > 0L)

    val swept = Residue.sweep(spark, force = true)
    assert(swept)
    assert(CachePool.liveCount == 0)
    val (after, _) = Residue.storageUsed(spark)
    // the residue BOUND: whatever 6 broadcast-join queries left behind,
    // a sweep returns block storage to below 8 MB (observed: 0 — the
    // slack only covers torrent bookkeeping pieces, not relations)
    assert(after < 8L * 1024 * 1024,
      s"post-sweep storage still holds $after bytes (was $before)")
    assert(after <= before)
  }

  test("sweep below the trigger is cheap and does not run the full pass") {
    Residue.sweep(spark, force = true) // start clean
    val n0 = Residue.sweeps
    // nothing cached, nothing broadcast: occupancy is under any sane
    // trigger, so the call must stay a CachePool-only no-op
    val ran = Residue.sweep(spark)
    assert(!ran)
    assert(Residue.sweeps == n0)
  }
}
