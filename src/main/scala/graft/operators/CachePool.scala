package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded registry for operator-internal persisted DataFrames.
  *
  * Operators like [[GridCluster.cellAssign]] and the
  * [[Similarity]] signature builders persist intermediate frames whose
  * consumers are LAZY results handed back to the caller — the operator
  * can never know when the caller's last action has run, so it cannot
  * unpersist deterministically, and relying on the ContextCleaner lets
  * cached viewport projections/signature tables pile up in a long-lived
  * serving process (round-2 verdict #3/advice). The pool gives those
  * persists a bounded FIFO lifecycle instead: the newest `maxLive`
  * frames stay cached, older ones are unpersisted eagerly. Evicting a
  * frame a lazy result still references is safe — Spark recomputes the
  * lineage on the next action (slower, never wrong).
  *
  * Per-round *loop* persists (label propagation, Lloyd iterations) do
  * NOT go through the pool — they are materialized and explicitly
  * unpersisted inside their loops.
  */
object CachePool {
  /** Upper bound on simultaneously cached frames. Must exceed the
    * largest number of pool-tracked frames one composed query can hold
    * live at once (the corpus-cleaning capstone holds 4) with headroom
    * for a few concurrent viewport queries.
    */
  private val maxLive = 12
  private val live = new java.util.ArrayDeque[DataFrame]()

  /** Persist (MEMORY_AND_DISK) and track; evicts the oldest tracked
    * frames beyond [[maxLive]]. Returns the same DataFrame.
    */
  def track(df: DataFrame): DataFrame = synchronized {
    // idempotent: loop-persisted frames (e.g. the CC labels) arrive
    // already cached — re-persisting would only log a CacheManager warn
    if (df.storageLevel == StorageLevel.NONE) df.persist(StorageLevel.MEMORY_AND_DISK)
    live.addLast(df)
    while (live.size > maxLive) live.pollFirst().unpersist(true)
    df
  }

  /** Number of currently tracked cached frames (test hook). */
  def liveCount: Int = synchronized(live.size)

  /** Unpersist everything tracked (service shutdown / test isolation). */
  def clear(): Unit = synchronized {
    while (!live.isEmpty) live.pollFirst().unpersist(true)
  }
}
