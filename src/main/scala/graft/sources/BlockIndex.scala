package graft.sources

import graft.operators.{CachePool, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted repeated-block (boilerplate) count index + incremental
  * gate — the line-level-dedup member of the serving/index family
  * (signature index, text index, vector index, geo pyramid). The
  * production shape: the corpus's block multiplicities are counted
  * ONCE and persisted; each ingest batch is cleaned with work
  * proportional to the BATCH (its block keys probe the sorted count
  * table), never a corpus re-count.
  *
  * Layout: one table `blocks/` (btxt, cnt), range-partitioned and
  * sorted by btxt so a batch's block-key join prunes to matching key
  * slices. Counts are MERGEABLE integer sums, so appends are new
  * sorted-within-themselves files whose per-key rows sum at probe
  * time; [[compact]] re-aggregates and restores the clustered layout —
  * the same LSM-flavored append/compact contract as the other indexes.
  */
object BlockIndex {

  private def counts(docs: DataFrame, blockLen: Int,
                     textCol: String, idCol: String): DataFrame =
    Dedup.blockRows(docs, blockLen, textCol, idCol)
      .groupBy(col("btxt")).agg(count(lit(1)).as("cnt"))

  /** Build + persist the block-count index for `docs` (overwrites). */
  def save(docs: DataFrame, path: String, blockLen: Int = 4,
           textCol: String = "text", idCol: String = "doc_id"): String = {
    counts(docs, blockLen, textCol, idCol)
      .repartitionByRange(col("btxt")).sortWithinPartitions("btxt")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/blocks")
    path
  }

  /** Fold a batch's block counts into the index without rebuilding —
    * counts sum across files, so an append is just more (btxt, cnt)
    * rows. Sortedness degrades across appends until [[compact]].
    */
  def append(docs: DataFrame, path: String, blockLen: Int = 4,
             textCol: String = "text", idCol: String = "doc_id"): String = {
    counts(docs, blockLen, textCol, idCol)
      .sortWithinPartitions("btxt")
      .write.mode("append").option("compression", "zstd")
      .parquet(s"$path/blocks")
    path
  }

  /** Re-aggregate per-key rows and restore the probe-optimal sorted
    * range layout (staged rewrite + swap — never serves partial state).
    */
  def compact(spark: SparkSession, path: String): String = {
    val tmp = path + ".compact"
    spark.read.parquet(s"$path/blocks")
      .groupBy(col("btxt")).agg(sum(col("cnt")).as("cnt"))
      .repartitionByRange(col("btxt")).sortWithinPartitions("btxt")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$tmp/blocks")
    StagedSwap.swap(path, tmp)
    path
  }

  /** Clean a batch against the persisted corpus counts: drop every
    * block the INDEXED corpus contains ≥ `minRepeat` times, reassemble
    * the survivors — [[graft.operators.Dedup.repeatedBlockFilter]]
    * semantics with the corpus count read from the index instead of
    * recomputed. Per-key rows are summed at probe time (append-merge),
    * and only the batch's own block keys are joined. Output: doc_id,
    * n_blocks, n_kept, kept_ppm, kept_hash — ordered by doc_id.
    */
  def boilerplateGate(spark: SparkSession, path: String, batch: DataFrame,
                      blockLen: Int = 4, minRepeat: Int = 3,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val idx = spark.read.parquet(s"$path/blocks")
    val blocks = CachePool.track(Dedup.blockRows(batch, blockLen, textCol, idCol))
    val total = blocks.select(col("btxt")).distinct()
      .join(idx, Seq("btxt"), "left")
      .groupBy(col("btxt")).agg(coalesce(sum(col("cnt")), lit(0L)).as("corpus_cnt"))
    Dedup.assembleKept(blocks.join(total, "btxt"),
      col("corpus_cnt") < minRepeat, idCol)
  }
}
