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

  test("null right-payload values stay synced to one right row") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 11:00:00"))
    ).toDF("trade_id", "sym", "t")
    // latest quote before trade 2 has a NULL price: per-column
    // last(ignoreNulls) would pair size=7 with the OLDER price 10.0;
    // the struct carry must report (7, null) — one row's values.
    val quotes = Seq(
      ("A", ts("2024-01-01 09:30:00"), Some(10.0), Some(5L)),
      ("A", ts("2024-01-01 10:30:00"), None, Some(7L))
    ).toDF("sym", "qt", "price", "size")

    val rows = AsOfJoin.asofJoin(trades, quotes, "sym", "t", "qt", Seq("price", "size"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        ((Option(r.getAs[java.lang.Double]("asof_price")),
          Option(r.getAs[java.lang.Long]("asof_size"))))).toMap
    assert(rows(1L) == ((Some(10.0), Some(5L))))
    assert(rows(2L) == ((None, Some(7L)))) // NOT (Some(10.0), Some(7L))
  }
}
