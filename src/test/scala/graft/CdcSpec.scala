package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** MERGE-INTO semantics as a relational operator: delete/update/upsert
  * apply, latest-op-wins within a batch, and SCD-2 history ranges.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "one"), (2L, "two"), (3L, "three"), (4L, "four")
  ).toDF("id", "v")

  test("applyChanges: delete, update, upsert-insert, append, latest-op-wins") {
    val changes = Seq(
      ("D", 2L, 1L, "x"),        // delete id 1
      ("U", 2L, 2L, "two'"),     // update id 2
      ("I", 2L, 5L, "five"),     // append new id 5
      ("I", 2L, 3L, "three'"),   // upsert-replace existing id 3
      ("D", 1L, 4L, "x"),        // superseded by...
      ("U", 2L, 4L, "four'")     // ...this later update (latest wins)
    ).toDF("op", "seq", "id", "v")
    val out = Cdc.applyChanges(base, changes, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "two'"), (3L, "three'"), (4L, "four'"), (5L, "five")))
  }

  test("applyChanges is idempotent for replayed batches") {
    val changes = Seq(("U", 2L, 2L, "two'"), ("D", 2L, 1L, "x"))
      .toDF("op", "seq", "id", "v")
    val once = Cdc.applyChanges(base, changes, "id")
    val twice = Cdc.applyChanges(once, changes, "id")
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("streaming CDC materialization: per-batch foreachBatch apply == one-shot apply") {
    val changes = Seq(
      // batch 0 (earlier seqs)
      ("U", 1L, 2L, "two'"), ("D", 1L, 1L, "x"), ("I", 1L, 5L, "five"),
      // batch 1 (later seqs; overrides batch 0 where keys repeat)
      ("U", 2L, 2L, "two''"), ("I", 2L, 6L, "six"), ("D", 2L, 5L, "x")
    ).toDF("op", "seq", "id", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-stream")
    changes.filter(col("seq") === 1L).write.parquet(s"$dir/b0.parquet")
    Thread.sleep(1100) // CDC order matters: separate mtimes so the file
    changes.filter(col("seq") === 2L).write.parquet(s"$dir/b1.parquet") // source triggers b0 first

    var table = base
    val q = spark.readStream
      .schema(changes.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*.parquet")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        table = Cdc.applyChanges(table, batch, "id")
        table.persist().count() // a production loop writes the table here
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = table.orderBy("id").collect().toSeq
    val oneShot = Cdc.applyChanges(base, changes, "id").orderBy("id").collect().toSeq
    assert(streamed == oneShot)
    assert(streamed.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((2L, "two''"), (3L, "three"), (4L, "four"), (6L, "six")))
  }

  test("history: SCD-2 ranges with open current versions; D closes the key") {
    val changes = Seq(
      ("I", 1L, 7L, "a"), ("U", 3L, 7L, "b"), ("U", 9L, 7L, "c"), // 3 versions
      ("I", 1L, 8L, "a"), ("D", 5L, 8L, "x")                       // deleted key
    ).toDF("op", "seq", "id", "v")
    val out = Cdc.history(changes, "id")
      .select("id", "seq", "valid_from", "valid_to", "is_current")
      .orderBy("id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (7L, 1L, 1L, 3L, false),
      (7L, 3L, 3L, 9L, false),
      (7L, 9L, 9L, -1L, true),
      (8L, 1L, 1L, 5L, false))) // version closed by the delete, no current row
  }
}
