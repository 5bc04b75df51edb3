package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming surface (north-star extension — the reference
  * is batch/request-response only, SURVEY §2.9). The tumbling-window
  * aggregation here is the streaming twin of the oracle-checked batch
  * definition in [[graft.queries.Events.qStreamWindow]]: same window,
  * same grouping, same exact decimal sums — so the streaming output can
  * be validated against the batch result on a finite input.
  */
object EventStream {

  /** Streaming source over an events parquet directory (TIMESTAMP_NANOS
    * read as LONG then truncated to µs, as in the batch reader).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked tumbling 6-hour counts/sums per event type. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Run the windowed aggregation into an in-memory table (complete
    * mode — finite demo inputs; production would use append + a real
    * sink). Caller stops the query.
    */
  def startMemorySink(agg: DataFrame, name: String): StreamingQuery =
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
}
