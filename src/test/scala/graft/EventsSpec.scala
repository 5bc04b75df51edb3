package graft

import graft.queries.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))

  test("funnel: steps must occur strictly in order; partial funnels keep NULLs") {
    val events = ev(
      // user 1: full funnel in order
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // user 2: click BEFORE the first view — not a funnel step
      (4L, 1000L, 2L, "click"), (5L, 2000L, 2L, "view"),
      // user 3: view then purchase with no click between — depth 1
      (6L, 1000L, 3L, "view"), (7L, 2000L, 3L, "purchase"),
      // user 4: never viewed — excluded entirely
      (8L, 1000L, 4L, "purchase"))
    val out = Events.qFunnel(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("depth")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("funnel picks the FIRST valid completion of each step") {
    val events = ev(
      (1L, 1000L, 1L, "view"), (2L, 5000L, 1L, "click"),
      (3L, 9000L, 1L, "click"), // later click ignored
      (4L, 7000L, 1L, "purchase")) // after first click → counts
    val r = Events.qFunnel(events).collect().head
    assert(r.getAs[java.sql.Timestamp]("t_click").getTime == 0L + 5L) // 5000 µs = 5 ms
    assert(r.getAs[Long]("depth") == 3L)
  }

  test("retention counts distinct users per cohort-day offset") {
    val day = 86400000000L
    val events = ev(
      // user 1 signs up day 0, active day 0 and day 2
      (1L, 0L, 1L, "signup"), (2L, 2 * day + 5L, 1L, "click"),
      // user 2 signs up day 0, active day 2 as well
      (3L, 10L, 2L, "signup"), (4L, 2 * day + 9L, 2L, "view"),
      // user 3 signs up day 1 only
      (5L, day + 3L, 3L, "signup"),
      // user 4 never signs up → not in any cohort
      (6L, 7L, 4L, "view"))
    val out = Events.qRetention(events).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 2L) -> 2L, (1L, 0L) -> 1L))
  }
}
