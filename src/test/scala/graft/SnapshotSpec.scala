package graft

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added / removed / modified / unchanged") {
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val b = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("doc_id", "text")
    val got = Snapshot.diff(a, b)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "modified", 4L -> "added"))
  }

  test("digests ride both sides; absent side is empty string") {
    val a = Seq((1L, "alpha")).toDF("doc_id", "text")
    val b = Seq((2L, "beta")).toDF("doc_id", "text")
    val byId = Snapshot.diff(a, b).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(byId(1L)._1.nonEmpty && byId(1L)._2.isEmpty)
    assert(byId(2L)._1.isEmpty && byId(2L)._2.nonEmpty)
  }
}
