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
}
