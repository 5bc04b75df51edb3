package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-residue bound for long-lived sessions (r14 verdict item 1).
  *
  * A multi-hundred-query suite leaves residue in the driver JVM that no
  * per-query teardown touches. The load-bearing piece is broadcast
  * blocks: every broadcast join leaves its `Broadcast` value and torrent
  * pieces in the BlockManager, and Spark's ContextCleaner only removes
  * them after the `Broadcast` handle is GARBAGE COLLECTED (weak-ref
  * queue) — which for handles promoted to the old generation means a
  * full/mixed collection that a suite of short queries may never
  * trigger (the cleaner's own periodic-GC backstop defaults to 30 min,
  * longer than a whole suite). Dead blocks are not "just garbage":
  * `spark.memory.storageFraction` (default 0.5) PROTECTS up to half the
  * unified pool from execution eviction, so at a 16 GB heap ~4.7 GB of
  * unreachable broadcast remnants can squeeze the execution pool and
  * push a big shuffle join into spill — exactly the q_dedup_ngram
  * 38 s-in-suite vs 13.9 s-isolated inflation SCALING.md measured at
  * sf1 (r14: masked by sizing the heap to 48 GB; this bounds the cause
  * instead).
  *
  * [[sweep]] is adaptive: O(1) telemetry per call; the full
  * clearCache + System.gc() + cleaner-drain only runs when block
  * storage crosses the threshold. A suite whose queries leave little
  * behind (sf0.1 at 16 GB) pays a few milliseconds per call; a decade
  * suite sweeps every few broadcast-heavy queries and keeps the
  * execution pool whole. The same call is the teardown a long-lived
  * 100 TB serving driver would run between request batches.
  */
object Residue {

  /** Bytes of BlockManager storage currently occupied (cached RDD/DF
    * blocks + broadcast pieces), and the storage ceiling, summed over
    * executors — in local mode, the one driver JVM.
    */
  def storageUsed(spark: SparkSession): (Long, Long) = {
    val stats = spark.sparkContext.getExecutorMemoryStatus.values
    val max = stats.map(_._1).sum
    val rem = stats.map(_._2).sum
    (max - rem, max)
  }

  /** Default trigger: sweep when dead/dropped blocks hold more than
    * this fraction of the storage ceiling. 1/8 of a 16 GB heap's
    * ~9.4 GB unified pool ≈ 1.2 GB — far above anything one healthy
    * query keeps live after its CachePool teardown, far below the
    * protected-storage level where execution starts to starve.
    */
  val DefaultTriggerFrac = 0.125

  @volatile private var sweepCount = 0L
  /** Number of full sweeps performed (probe/spec telemetry). */
  def sweeps: Long = sweepCount

  /** Between-queries teardown. Always drops CachePool-tracked persists
    * (cheap); when block storage exceeds `triggerFrac` of the ceiling
    * (or `force`), additionally clears straggler cached plans, runs a
    * full GC so the ContextCleaner sees the dead broadcast handles,
    * and waits (bounded) for the cleaner to drain the blocks. Returns
    * true when the full sweep ran.
    *
    * Assumes suite/serving ownership of the session: any cached plan
    * still registered is residue, not someone's live working set.
    */
  def sweep(spark: SparkSession,
            triggerFrac: Double = DefaultTriggerFrac,
            force: Boolean = false): Boolean = {
    CachePool.clear()
    val (used, max) = storageUsed(spark)
    val debug = sys.env.contains("GRAFT_RESIDUE_DEBUG")
    // experiment knob: override the trigger fraction (e.g. 0 = sweep on
    // every call) without recompiling — A/B measurement plumbing
    val frac = sys.env.get("GRAFT_RESIDUE_FRAC")
      .flatMap(v => scala.util.Try(v.toDouble).toOption).getOrElse(triggerFrac)
    if (!force && (max <= 0 || used < max * frac)) {
      if (debug) println(f"[residue] skip used=${used / 1e6}%.0f MB of ${max / 1e6}%.0f MB")
      return false
    }
    if (debug) println(f"[residue] SWEEP used=${used / 1e6}%.0f MB of ${max / 1e6}%.0f MB " +
      f"heap=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1e6}%.0f MB")
    spark.catalog.clearCache()
    System.gc()
    // the cleaner drains the reference queue asynchronously; poll until
    // occupancy stops improving (two stable reads) or ~3 s cap — a
    // bounded wait, never a hang, and typically two or three beats
    var last = Long.MaxValue
    var stable = 0
    var waited = 0
    while (stable < 2 && waited < 30) {
      Thread.sleep(100)
      waited += 1
      val now = storageUsed(spark)._1
      if (now < last) { last = now; stable = 0 } else stable += 1
    }
    sweepCount += 1
    true
  }
}
