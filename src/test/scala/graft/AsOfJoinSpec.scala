package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest right row at or before each left row, per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 10:03:00")),
      (4L, "A", ts("2024-01-01 09:00:00")) // before any quote
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:00"), 10.0),
      ("A", ts("2024-01-01 10:05:00"), 11.0), // equal ts joins (inclusive)
      ("B", ts("2024-01-01 10:00:00"), 20.0)
    ).toDF("sym", "qt", "price")

    val out = AsOfJoin.asofJoin(trades, quotes, "sym", "t", "qt", Seq("qt", "price"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[java.lang.Double]("asof_price")))).toMap
    assert(out(1L).contains(10.0))
    assert(out(2L).contains(11.0)) // inclusive at equal timestamps
    assert(out(3L).contains(20.0))
    assert(out(4L).isEmpty) // no quote yet → null (left-outer)
  }
}
