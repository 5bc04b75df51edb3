package graft

import graft.operators.TrainingPrep
import org.apache.spark.sql.functions._

class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("packing: contiguous fill, token conservation, offsets inside the budget") {
    // one shard so the fill order is the plain id order
    val docs = Seq((1L, 100L), (2L, 50L), (3L, 900L), (4L, 10L))
      .toDF("doc_id", "nt")
    val out = TrainingPrep.packSequences(docs, budget = 512, shards = 1,
      tokenCountCol = col("nt")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"))).toMap
    // cum-before: 0, 100, 150, 1050
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (0L, 100L))
    assert(out(3L) == (0L, 150L))   // starts in bin 0, crosses into bin 1/2
    assert(out(4L) == (2L, 26L))    // 1050 div 512 = 2, 1050 % 512 = 26
  }

  test("packing is shard-parallel and conserves every token") {
    val docs = spark.range(1, 1001).select(col("id").as("doc_id"),
      (col("id") % 37 + 1).as("nt"))
    val out = TrainingPrep.packSequences(docs, budget = 256, shards = 8,
      tokenCountCol = col("nt"))
    assert(out.agg(sum("n_tokens")).head.getLong(0) ==
      docs.agg(sum("nt")).head.getLong(0))
    // every offset lies inside the budget; shards are the id classes
    assert(out.filter(col("bin_offset") >= 256 || col("bin_offset") < 0).isEmpty)
    assert(out.filter(pmod(col("doc_id"), lit(8L)) =!= col("shard")).isEmpty)
  }

  test("hash sampling keeps ~rate deterministically, stratified by column") {
    val docs = spark.range(1, 20001).select(col("id").as("doc_id"),
      when(col("id") % 4 === 0, "en").otherwise("de").as("lang"))
    val out = TrainingPrep.sampleStrata(docs, "lang",
      rates = Map("en" -> 0.5), defaultRate = 0.1)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5000 en at 50%, 15000 de at 10% — hash uniformity within a few %
    assert(math.abs(counts("en") - 2500.0) / 2500.0 < 0.10, counts.toString)
    assert(math.abs(counts("de") - 1500.0) / 1500.0 < 0.10, counts.toString)
    // deterministic: same input, same keep set
    assert(out.exceptAll(TrainingPrep.sampleStrata(docs, "lang",
      Map("en" -> 0.5), 0.1)).isEmpty)
  }
}
