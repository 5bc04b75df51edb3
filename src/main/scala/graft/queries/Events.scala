package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-time operators over the `events` table — the batch-equivalent
  * semantics of the Structured Streaming surface (SURVEY §2.9: the
  * reference has no streaming; this is §7 extension scope). The live
  * `readStream` version of the tumbling-window query is
  * [[graft.streaming.EventStream]]; these batch forms are the
  * oracle-checkable definitions.
  */
object Events {

  /** Tumbling 6-hour event-time window per event type — the Spark
    * `window()` function (epoch-aligned), oracle-mirrored with integer
    * µs bucket arithmetic.
    */
  def qStreamWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  val qStreamWindowSql: String =
    """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS ws,
      |       make_timestamp((epoch_us(ts) // 21600000000) * 21600000000 + 21600000000) AS we,
      |       event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY ws, event_type""".stripMargin

  /** As-of join: each event annotated with the user's most recent
    * purchase at or before it (see [[graft.operators.AsOfJoin]]). The
    * oracle uses DuckDB's native ASOF JOIN — same semantics, different
    * machinery, which is exactly what makes it a strong check.
    */
  def qAsofJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value").as("pvalue"))
    graft.operators.AsOfJoin.asofJoin(
      events.select(col("event_id"), col("user_id"), col("ts"), col("value")),
      purchases, key = "user_id", leftTime = "ts", rightTime = "pts",
      rightPayload = Seq("pts", "pvalue"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """SELECT e.event_id, e.user_id, e.ts, e.value,
      |       p.pts AS asof_pts, p.pvalue AS asof_pvalue
      |FROM (SELECT event_id, user_id, ts, value FROM events) e
      |ASOF LEFT JOIN (SELECT user_id, ts AS pts, value AS pvalue
      |                FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.pts
      |ORDER BY e.event_id""".stripMargin

  /** Sessionization: per-user sessions split at >30-minute gaps —
    * lag + cumulative-sum-of-boundaries, both windows sharing one
    * shuffle on user_id.
    */
  def qSessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("boundary")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))

  }

  /** Sessionize SELECT without the final ORDER BY (reused as a CTE by
    * the range-join oracle).
    */
  private val sessionizeBody: String =
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
      |       min(ts) AS t_start, max(ts) AS t_end,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT *, sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |                   THEN 1 ELSE 0 END AS boundary
      |    FROM (
      |      SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |      FROM events
      |    )
      |  )
      |)
      |GROUP BY user_id, session_id""".stripMargin

  val qSessionizeSql: String =
    s"$sessionizeBody\nORDER BY user_id, session_id"

  /** Range join (bucketed): assign every event to the session interval
    * containing it — `ts BETWEEN t_start AND t_end` on the same user,
    * executed as the equi-join-on-(key, bucket) rewrite
    * ([[graft.operators.RangeJoin]]). Sessions partition each user's
    * timeline, so exactly one row per event comes back.
    */
  def qRangeJoin(events: DataFrame): DataFrame = {
    val sess = qSessionize(events)
      .select(col("user_id"), col("session_id"), col("t_start"), col("t_end"))
    graft.operators.RangeJoin.bucketed(
      events.select(col("event_id"), col("user_id"), col("ts")),
      sess, key = "user_id", t = "ts", lo = "t_start", hi = "t_end")
      .select(col("event_id"), col("user_id"), col("session_id"))
      .orderBy("event_id")
  }

  val qRangeJoinSql: String =
    s"""WITH sess AS ($sessionizeBody)
       |SELECT e.event_id, e.user_id, s.session_id
       |FROM events e
       |JOIN sess s ON e.user_id = s.user_id
       |            AND e.ts >= s.t_start AND e.ts <= s.t_end
       |ORDER BY e.event_id""".stripMargin
}
