package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (public knowledge: Flajolet et
  * al. 2007) — the mergeable cardinality summary beside the KMV
  * sketch ([[QualityRules.kmvDistinct]]): m = 256 registers, each
  * holding the max leading-zero rank of the values hashed into it.
  *
  * Cross-engine exactness discipline: the hash is the repo's md5
  * 60-bit recipe (register = top 8 bits, rank over the remaining 52),
  * the rank comes from an explicit bit scan (never `log2`), and the
  * harmonic sum Σ2^(−M_j) lives on the exact 2^(−53) integer lattice
  * (every term is `1 << (53 − M_j)`; 256 registers × 2^53 < 2^62), so
  * registers AND estimates are bit-identical in DuckDB. Only the
  * linear-counting branch calls `ln`, absorbed by output rounding.
  *
  * Scale shape: one map-side-combined (key, register) max — at most
  * 256·|keys| rows shuffle regardless of input size — then a |keys|
  * finalize. Register tables from disjoint batches merge by register
  * max ([[merge]]), so incremental maintenance is a batch-sized
  * aggregation; merged-then-finalized ≡ whole-corpus bit-for-bit
  * (register max is associative), which `q_hll_merge` pins hash-exactly.
  */
object Hll {
  val RegisterBits = 8
  val M: Int = 1 << RegisterBits // 256 registers
  private val HashBits = 60     // 15 hex chars of md5
  private val RankBits = HashBits - RegisterBits // 52

  /** Per-key register maxima: (keyCols…, reg, mj). */
  def registers(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame = {
    val h = conv(substring(md5(value), 1, 15), 16, 10).cast("long")
    df.select(keyCols.map(col) :+ h.as("h"): _*)
      .withColumn("reg", expr(s"h >> $RankBits"))
      .withColumn("w", expr(s"h & ${(1L << RankBits) - 1}"))
      // rank = leading zeros in the 52-bit word + 1 = 52 − msb(w);
      // msb by explicit bit scan — identical shape in the oracle SQL
      .withColumn("msb", expr(
        s"array_max(transform(sequence(0, ${RankBits - 1}), j -> " +
          "IF(((w >> j) & 1) = 1, j, -1)))"))
      .withColumn("rank",
        when(col("w") === 0, lit(RankBits + 1)).otherwise(lit(RankBits) - col("msb")))
      .groupBy(keyCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rank")).as("mj"))
  }

  /** Associative merge of two register tables (same key schema). */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col) :+ col("reg"): _*)
      .agg(max(col("mj")).as("mj"))

  /** Finalize register maxima into estimates:
    * (keyCols…, n_regs, v_zero, sum_inv_scaled, est_distinct).
    */
  def finalizeEstimate(regs: DataFrame, keyCols: Seq[String]): DataFrame = {
    val two53 = 1L << 53
    regs
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("CAST(1 AS BIGINT) << (53 - mj)")).as("present_sum"))
      .withColumn("v_zero", lit(M.toLong) - col("n_regs"))
      .withColumn("sum_inv_scaled", col("present_sum") + col("v_zero") * lit(two53))
      .withColumn("raw_est", expr(
        s"(0.7213 / (1.0 + 1.079 / $M.0)) * $M.0 * $M.0 * ${two53.toDouble} " +
          "/ CAST(sum_inv_scaled AS DOUBLE)"))
      .withColumn("est_distinct", round(
        when(col("v_zero") > 0 && col("raw_est") <= lit(2.5 * M),
          lit(M.toDouble) * log(lit(M.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("raw_est")), 3))
      .select(keyCols.map(col) ++ Seq(col("n_regs"), col("v_zero"),
        col("sum_inv_scaled"), col("est_distinct")): _*)
  }

  /** One-shot estimate over a value column per key. */
  def estimate(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame =
    finalizeEstimate(registers(df, keyCols, value), keyCols)
}
