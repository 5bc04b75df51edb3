package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._

/** HLL sketch contracts: estimation accuracy in BOTH regimes (linear
  * counting and the raw harmonic estimator), exact mergeability, and
  * the bounded register-table size.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within theoretical error on 100k distinct values (raw branch)") {
    val n = 100000
    val df = (1 to n).map(i => ("k", s"value-$i")).toDF("g", "v")
    val r = Hll.estimate(df, Seq("g"), col("v")).collect().head
    val est = r.getAs[Double]("est_distinct")
    assert(r.getAs[Long]("v_zero") == 0L, "100k values must touch all 256 registers")
    // standard error ≈ 1.04/√256 = 6.5%; allow 4σ
    assert(math.abs(est - n) < n * 0.26, s"est $est vs $n")
  }

  test("small cardinality routes through linear counting and is near-exact") {
    val df = (1 to 40).map(i => ("k", s"v$i")).toDF("g", "v")
    val r = Hll.estimate(df, Seq("g"), col("v")).collect().head
    assert(r.getAs[Long]("v_zero") > 0)
    assert(math.abs(r.getAs[Double]("est_distinct") - 40.0) < 8.0)
  }

  test("duplicates do not move the registers; merge of halves equals the whole") {
    val vals = (1 to 5000).map(i => ("k", s"t$i"))
    val whole = vals ++ vals // every value twice
    val dfW = whole.toDF("g", "v")
    val w = Hll.estimate(dfW, Seq("g"), col("v")).collect().head
    val once = Hll.estimate(vals.toDF("g", "v"), Seq("g"), col("v")).collect().head
    assert(w == once, "duplicate values must not change the sketch")

    val (h1, h2) = vals.splitAt(2500)
    val merged = Hll.finalizeEstimate(
      Hll.merge(
        Hll.registers(h1.toDF("g", "v"), Seq("g"), col("v")),
        Hll.registers(h2.toDF("g", "v"), Seq("g"), col("v")), Seq("g")),
      Seq("g")).collect().head
    assert(merged == once, "merged halves must finalize bit-identically")
  }

  test("register table is bounded by m per key regardless of input size") {
    val df = (1 to 20000).map(i => (s"g${i % 3}", s"x$i")).toDF("g", "v")
    val regs = Hll.registers(df, Seq("g"), col("v"))
    val counts = regs.groupBy("g").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= Hll.M))
  }
}
