package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(left: org.apache.spark.sql.DataFrame,
                    right: org.apache.spark.sql.DataFrame, d: Int): Set[(Long, Long, Long)] =
    left.select(col("l_id"), col("name").as("l_str"))
      .crossJoin(right.select(col("r_id"), col("name").as("r_str")))
      .withColumn("dist", levenshtein(col("l_str"), col("r_str")).cast("long"))
      .filter(col("dist") <= d)
      .select("l_id", "r_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bucketed(left: org.apache.spark.sql.DataFrame,
                       right: org.apache.spark.sql.DataFrame, d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editJoin(left, right, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("editJoin ≡ naive levenshtein join at d=1 (head/middle/tail edits)") {
    val canon = Seq(
      (1L, "golden lavender spring"),
      (2L, "midnight powder rose"),
      (3L, "antique chartreuse mint"),
      (4L, "x")
    ).toDF("r_id", "name")
    val dirty = Seq(
      (10L, "olden lavender spring"),    // head deletion of 1
      (11L, "midnight powd3r rose"),     // middle substitution of 2
      (12L, "antique chartreuse mintx"), // tail insertion of 3
      (13L, "completely different"),     // matches nothing
      (14L, "x"),                        // exact match of 4
      (15L, "xy")                        // 1 insert from 4
    ).toDF("l_id", "name")
    val got = bucketed(dirty, canon, 1)
    val want = naive(dirty, canon, 1)
    assert(got == want && want.nonEmpty)
    assert(want.contains((10L, 1L, 1L)) && want.contains((14L, 4L, 0L)))
  }

  test("editJoin ≡ naive levenshtein join at d=2") {
    val canon = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "ab")
    ).toDF("r_id", "name")
    val dirty = Seq(
      (10L, "alpha beta gamm"),     // 1 edit
      (11L, "alXha bYta gamma"),    // 2 substitutions
      (12L, "delta epsilon zetaXY"),// 2 insertions
      (13L, "dlta epsiln zeta"),    // 2 deletions
      (14L, "alpha beta"),          // 6 away — excluded
      (15L, "b")                    // 1 away from "ab"
    ).toDF("l_id", "name")
    val got = bucketed(dirty, canon, 2)
    val want = naive(dirty, canon, 2)
    assert(got == want && want.size >= 5)
  }

  test("candidate generation is constant fan-out per row") {
    // (2d+1)^2 (d+1) substrings max per left row at d=1 -> 18
    val one = Seq((1L, "abcdefghij")).toDF("l_id", "name")
    val none = Seq.empty[(Long, String)].toDF("r_id", "name")
    // editJoin on empty right: result empty, but the left expansion must not blow up
    assert(FuzzyJoin.editJoin(one, none, 1).count() == 0)
  }
}
