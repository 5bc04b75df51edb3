package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of rows share one key — the classic straggler shape
    val big = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(99L)).as("k"),
        $"id".as("payload"))
    val small = Seq((99L, "hot"), (0L, "a"), (3L, "b"), (6L, "c")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", buckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("payload").as("s"))

    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.filter($"k" === 99).head().getAs[Long]("n") === 9000L)
  }

  test("skewReport surfaces the hot key with exact shares, top-k via TakeOrdered") {
    // key 7 carries 60 of 100 rows; 40 keys with 1 row
    val rows = Seq.fill(60)(7L) ++ (100L until 140L)
    val df = rows.map(k => (k, "x")).toDF("k", "payload")
    val out = SkewJoin.skewReport(df, "k", topK = 3).collect()
    assert(out.length == 3)
    val top = out.head
    assert((top.getAs[Long]("rank"), top.getAs[Long]("key"), top.getAs[Long]("cnt")) ==
      ((1L, 7L, 60L)))
    assert(top.getAs[Long]("share_ppm") == 600000L)    // 60/100
    assert(top.getAs[Long]("skew_x_ppm") == 24600000L) // 60 / (100/41 per key)
    assert(top.getAs[Long]("n_keys") == 41L && top.getAs[Long]("n_rows") == 100L)
    // the global top-k is a TakeOrderedAndProject, not a full-data window
    val plan = SkewJoin.skewReport(df, "k", topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"rank not pushed:\n$plan")
  }
}
