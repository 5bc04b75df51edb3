package graft

import graft.operators.RangeJoin
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Bucketed range join ≡ the naive BETWEEN theta join, duplicate-free,
  * across intervals spanning zero, one, and many buckets.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches the naive theta join exactly, no duplicates") {
    val points = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 13:59:59")),
      (3L, "A", ts("2024-01-01 14:00:00")), // inclusive upper edge
      (4L, "B", ts("2024-01-01 10:30:00")), // right key, outside interval
      (5L, "B", ts("2024-01-02 09:00:00"))
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      ("A", 10L, ts("2024-01-01 09:30:00"), ts("2024-01-01 14:00:00")), // spans 10 buckets
      ("A", 11L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")), // zero-width
      ("B", 20L, ts("2024-01-02 08:45:00"), ts("2024-01-02 09:15:00"))
    ).toDF("k", "iid", "lo", "hi")

    val out = RangeJoin.bucketed(points, intervals, "k", "t", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == naive)
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L), (5L, 20L)))
    // duplicate-free even though interval 10 explodes across many buckets
    val n = RangeJoin.bucketed(points, intervals, "k", "t", "lo", "hi").count()
    assert(n == out.size)

    // the span/width contract fails LOUDLY: with a cap below interval
    // 10's 10-bucket span, the job raises instead of silently exploding
    val e = intercept[Exception] {
      RangeJoin.bucketed(points, intervals, "k", "t", "lo", "hi",
        maxBucketsPerInterval = 5L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("RangeJoin: an interval spans")),
      s"unexpected failure: $e")
    // and a cap that accommodates the data changes nothing
    assert(RangeJoin.bucketed(points, intervals, "k", "t", "lo", "hi",
      maxBucketsPerInterval = 10L).count() == out.size)
  }
}
