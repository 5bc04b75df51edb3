package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Checkpoint-resume robustness: the online dedup's signature state
  * must survive a query restart — a duplicate arriving AFTER the
  * restart of its original's run is still dropped. Without a restored
  * state store the second run would re-admit it; this is the property
  * a continuously-ingesting pipeline leans on across deploys.
  */
class StreamingResumeSpec extends SparkSpec {
  import spark.implicits._

  test("online dedup state survives a checkpointed restart") {
    val srcDir = Files.createTempDirectory("graft-resume-src").toString
    val ckpt = Files.createTempDirectory("graft-resume-ckpt").toString
    val outDir = Files.createTempDirectory("graft-resume-out").toString + "/out"

    def startQuery() =
      graft.streaming.DocStream.dedupDocs(
          graft.streaming.DocStream.readDocs(spark, srcDir))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("doc_id", "text").write.mode("append").parquet(outDir)
        }
        .start()

    def writeDocs(name: String, rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(srcDir)

    // run 1: two originals
    writeDocs("a", Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "spark shuffles partition data across the executor fleet")))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // run 2 (fresh query, SAME checkpoint): one replay of doc 1's text
    // under a new id, one genuinely new doc
    writeDocs("b", Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "a genuinely new document arriving after the restart")))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 11L),
      s"restored state should drop the post-restart replay (doc 10): $out")
  }

  test("transition-pair state survives a checkpointed restart") {
    val srcDir = Files.createTempDirectory("graft-resume2-src").toString
    val ckpt = Files.createTempDirectory("graft-resume2-ckpt").toString
    val outDir = Files.createTempDirectory("graft-resume2-out").toString + "/out"
    val savedTsType = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      def startQuery() =
        graft.streaming.EventStream.transitionPairs(
            graft.streaming.EventStream.readEvents(spark, srcDir))
          .toDF()
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()

      def writeEvents(rows: Seq[(Long, Long, Long, String)]): Unit =
        rows.map { case (id, us, user, tpe) => (id, us, user, tpe, 1.0, "{}") }
          .toDF("event_id", "us", "user_id", "event_type", "value", "props")
          .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
            "event_type", "value", "props")
          .coalesce(1).write.mode("append").parquet(srcDir)

      // run 1: user 1 sees view then click
      writeEvents(Seq((1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click")))
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()

      // run 2 (fresh query, SAME checkpoint): one more event — the
      // (click → purchase) pair only exists if the click survived in
      // restored state
      writeEvents(Seq((3L, 3000L, 1L, "purchase")))
      val q2 = startQuery()
      q2.processAllAvailable(); q2.stop()

      val out = spark.read.parquet(outDir)
        .select("from_type", "to_type")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == Set(("view", "click"), ("click", "purchase")),
        s"restored state should bridge the restart: $out")
    } finally savedTsType match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }
}
