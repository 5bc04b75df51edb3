package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Proves the co-located-join storage contract at the PLAN level: two
  * tables bucketed on the join key join WITHOUT any shuffle exchange —
  * the layout a 100 TB deployment pre-buckets its fact/dim tables into
  * so repeated joins never pay the network. (The catalog's tile_z5
  * partitioning is the same idea for spatial scans; this spec covers
  * the relational side via Spark's native bucketing.)
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(p: SparkPlan): Int =
    p.collect { case _: ShuffleExchangeExec => 1 }.sum

  test("bucketed tables join with zero shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    // AQE wraps the plan and materializes exchanges lazily — disable it
    // so the executed plan exposes ShuffleExchangeExec nodes directly
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")

      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = joined.queryExecution.executedPlan
      assert(shuffles(plan) == 0,
        s"bucketed join must not shuffle; got plan:\n${plan.treeString.take(2000)}")
      assert(joined.count() == 1000L)

      // control: the same data UNBUCKETED shuffles both sides
      val c = a.join(b, "k")
      assert(shuffles(c.queryExecution.executedPlan) >= 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
