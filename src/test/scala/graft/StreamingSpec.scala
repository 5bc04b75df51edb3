package graft

import graft.streaming.EventStream
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured Streaming demo: the watermarked tumbling-window agg over
  * a file stream matches the oracle-checked batch definition
  * ([[graft.queries.Events.qStreamWindow]]) on the same finite input.
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg matches batch on finite input") {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.startMemorySink(
      EventStream.windowedAgg(EventStream.readEvents(spark, dir.toString)), "stream_out")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out")

      val batchEvents = spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"${dir.toString}/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      val batch = graft.queries.Events.qStreamWindow(batchEvents)

      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
