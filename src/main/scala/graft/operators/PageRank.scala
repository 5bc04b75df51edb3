package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PageRank over an undirected pair graph — the graph-
  * authority companion to [[Dedup.nearDupGroups]]'s connected
  * components: where CC answers "which docs form one duplication
  * cluster", rank answers "which doc is the HUB of its cluster" (the
  * most-connected template/boilerplate carrier — the doc a curation
  * pipeline inspects first).
  *
  * Arithmetic is the exact integer micro-unit lattice (same discipline
  * as the k-means trainer): ranks live in 1e-6 units, every division is
  * integer floor division (`div` in Spark, `//` in DuckDB — identical
  * on non-negatives), so k iterations are bit-identical across engines
  * and the oracle can unroll the same iterations as SQL CTEs. The
  * floored remainders simply leak out of the system (total mass decays
  * slightly) — fine for a RANKING signal, and the price of cross-engine
  * exactness.
  *
  * Scale shape: degrees ride on the edge list (one window pass,
  * persisted through the cache pool); each iteration is ONE
  * edges⋈ranks equi-join + ONE aggregation by destination — the
  * standard distributed PageRank round, k shuffles total, nothing
  * quadratic, no driver-side data movement (the loop is plan
  * composition only).
  */
object PageRank {

  private val Unit6 = 1000000L

  /** Rank in micro-units after `iters` damped rounds over the
    * bidirectional closure of `pairs` (id_a, id_b). Every node of the
    * pair graph has degree ≥ 1 and receives inflow each round (edges
    * are bidirectional), so the node set is stable across iterations.
    * Output (UNORDERED): doc_id, rank_micro.
    */
  def rankMicro(pairs: DataFrame, iters: Int = 4, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val base = Unit6 * (100L - dampingPct) / 100L
    // both directions in one pass (no self-union re-execution — the
    // same explode trick as nearDupGroups), degree attached per source
    val byU = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val edges = CachePool.track(pairs
      .select(explode(array(
        struct(col("id_a").as("u"), col("id_b").as("v")),
        struct(col("id_b").as("u"), col("id_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .withColumn("deg", count(lit(1)).over(byU)))
    var rank = edges.select(col("u").as("id")).distinct()
      .withColumn("r", lit(Unit6))
    for (_ <- 1 to iters) {
      rank = edges.join(rank, edges("u") === rank("id"))
        .select(col("v"), expr("r div deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("inflow"))
        .select(col("v").as("id"),
          (lit(base) + expr(s"($dampingPct * inflow) div 100")).as("r"))
    }
    rank.select(col("id").as("doc_id"), col("r").as("rank_micro"))
  }
}
