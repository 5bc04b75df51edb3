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

  test("decontamination flags exactly the docs sharing an eval shingle") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over"),   // shares "the quick brown"
      (2L, "totally unrelated text goes here"),
      (3L, "again the quick brown fox appears") // shares two eval shingles
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = TrainingPrep.contaminationReport(corpus, eval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(out == Map(1L -> 2L, 3L -> 2L)) // eval has shingles {t q b, q b f}
  }

  test("temperature mix at alpha=1 is a uniform tau-rate sample; tau=1 keeps all") {
    val docs = spark.range(1, 501).select(col("id").as("doc_id"),
      when(col("id") % 5 === 0, "big").otherwise("small").as("source"))
    val all = TrainingPrep.temperatureMix(docs, alpha = 1.0, targetFrac = 1.0)
    assert(all.count() == 500) // rate = tau = 1 for every source
    assert(all.filter(col("rate_ppm") =!= 1000000L).isEmpty)
  }

  test("temperature mix upsamples tail sources at the exact derived rates") {
    // n_A=900, n_B=100, alpha=0.5: w=(30e6,10e6), sw=40e6, N=1000
    // rate_A = .3*1000*30e6/(40e6*900) = 0.25; rate_B = .3*1000*10e6/(40e6*100) = 0.75
    val docs = spark.range(1, 1001).select(col("id").as("doc_id"),
      when(col("id") <= 900, "A").otherwise("B").as("source"))
    val out = TrainingPrep.temperatureMix(docs, alpha = 0.5, targetFrac = 0.3)
    val rates = out.select("source", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates == Map("A" -> 250000L, "B" -> 750000L))
    // empirical keeps track the rates (md5 uniformity), deterministically
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("A") - 225.0) / 225.0 < 0.15, counts.toString)
    assert(math.abs(counts("B") - 75.0) / 75.0 < 0.15, counts.toString)
    assert(out.exceptAll(
      TrainingPrep.temperatureMix(docs, alpha = 0.5, targetFrac = 0.3)).isEmpty)
  }

  test("dsir: target-like docs outscore off-target docs, feature counts exact") {
    val raw = Seq(
      (1L, "x x x x"),     // 3 × bigram "x x" — matches the target
      (2L, "y z y z")      // bigrams unseen in the target
    ).toDF("doc_id", "text")
    val target = Seq((100L, "x x x x x x")).toDF("doc_id", "text")
    val out = TrainingPrep.importanceWeights(raw, target, buckets = 4096).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Long]("logw_total"))).toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 3L)
    assert(out(1L)._2 > out(2L)._2)
    assert(out(1L)._2 > 0L)  // "x x" is MORE likely under the target
    assert(out(2L)._2 < 0L)  // unseen-in-target features: smoothing mass only
  }

  test("split assignment is exhaustive, stable under subsetting, near the fractions") {
    val docs = spark.range(1, 2001).select(col("id").as("doc_id"))
    val out = TrainingPrep.assignSplit(docs, trainFrac = 0.8, valFrac = 0.1)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 1600.0) / 1600.0 < 0.08, counts.toString)
    assert(math.abs(counts("val") - 200.0) / 200.0 < 0.30, counts.toString)
    assert(math.abs(counts("test") - 200.0) / 200.0 < 0.30, counts.toString)
    // a doc's split never changes when the table is subset or appended
    val subset = TrainingPrep.assignSplit(docs.filter(col("doc_id") < 100), 0.8, 0.1)
    assert(subset.exceptAll(out.filter(col("doc_id") < 100)).isEmpty)
    // degenerate fractions: everything is train
    assert(TrainingPrep.assignSplit(docs, 1.0, 0.0)
      .filter(col("split") =!= "train").isEmpty)
  }

  test("repetition stats: top-gram and duplicate-token shares") {
    val docsDf = Seq(
      (1L, "a b a b a b"),       // 2-grams: ab ba ab ba ab → top "a b" 3/5
      (2L, "w x y z"),           // all distinct
      (3L, "solo")               // <2 tokens: excluded
    ).toDF("doc_id", "text")
    val out = TrainingPrep.repetitionStats(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_gram_ppm"), r.getAs[Long]("dup_token_ppm"))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == (600000L, 666667L)) // 3/5 grams; 4 of 6 tokens duplicated
    assert(out(2L) == (333333L, 0L))      // 1 of 3 grams, no dup tokens
  }

  test("chunking: sliding windows cover every token with the configured overlap") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c")                                   // shorter than one window
    ).toDF("doc_id", "text")
    val out = TrainingPrep.chunkDocuments(docs, size = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_text")))
      .toMap
    // doc 1: starts 1,4,7,10 → lens 4,4,4,1
    assert(out((1L, 0L)) == (1L, 4L, "t1 t2 t3 t4"))
    assert(out((1L, 1L)) == (4L, 4L, "t4 t5 t6 t7"))   // overlap of 1 token
    assert(out((1L, 2L)) == (7L, 4L, "t7 t8 t9 t10"))
    assert(out((1L, 3L)) == (10L, 1L, "t10"))           // short tail window
    // doc 2: one short window
    assert(out((2L, 0L)) == (1L, 3L, "a b c"))
    assert(out.size == 5)
  }

  test("epoch shuffle: uniform shards, contiguous in-shard order, seed-keyed permutation") {
    val docs = spark.range(1, 2001).select(col("id").as("doc_id"))
    val e1 = TrainingPrep.shuffleShards(docs, seed = "epoch1", nShards = 8)
    val rows = e1.collect()
    assert(rows.length == 2000)
    assert(rows.forall(r => r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 8))
    // in-shard positions are exactly 0..count-1 (a permutation, no gaps)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.values.foreach { g =>
      assert(g.map(_.getAs[Long]("ord")).sorted.sameElements(0L until g.length))
    }
    // shards are near-uniform (md5 on [0,256) → 250 ± a few % per shard)
    assert(byShard.values.map(_.length).forall(n => n > 180 && n < 320))
    // deterministic for a fixed seed; a different epoch reorders
    assert(e1.exceptAll(TrainingPrep.shuffleShards(docs, "epoch1", 8)).isEmpty)
    val e2 = TrainingPrep.shuffleShards(docs, seed = "epoch2", nShards = 8)
    assert(e1.join(e2, Seq("doc_id", "shard", "ord"), "inner").count() < 100)
  }

  test("hash sampling boundary rates: 1.0 keeps all, 0.0 keeps none") {
    val docs = spark.range(1, 501).select(col("id").as("doc_id"), lit("en").as("lang"))
    assert(TrainingPrep.sampleStrata(docs, "lang", Map("en" -> 1.0), 1.0).count() == 500)
    assert(TrainingPrep.sampleStrata(docs, "lang", Map("en" -> 0.0), 0.0).count() == 0)
  }

  test("balancedShards: snake deal bounds shard-total spread far below modulo deal") {
    // heavily skewed sizes: doc i has size i² — modulo dealing by rank
    // would systematically overload one shard
    val docs = (1L to 200L).map(i => (i, i * i)).toDF("doc_id", "sz")
    val out = TrainingPrep.balancedShards(docs, nShards = 4, sizeCol = col("sz"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc assigned exactly once; shard ∈ [0, 4)
    assert(rows.length == 200 && rows.forall(r => r._4 >= 0 && r._4 < 4))
    // snake on the first two passes: ranks 0..3 → 0,1,2,3; ranks 4..7 → 3,2,1,0
    val byRank = rows.map(r => r._3 -> r._4).toMap
    assert((0L to 3L).map(byRank) == Seq(0L, 1L, 2L, 3L))
    assert((4L to 7L).map(byRank) == Seq(3L, 2L, 1L, 0L))
    val totals = rows.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    val spread = totals.values.max - totals.values.min
    val moduloTotals = rows.groupBy(r => r._3 % 4).view.mapValues(_.map(_._2).sum).toMap
    val moduloSpread = moduloTotals.values.max - moduloTotals.values.min
    assert(spread < moduloSpread / 10,
      s"snake spread $spread should crush modulo spread $moduloSpread")
    // deterministic
    val again = TrainingPrep.balancedShards(docs, nShards = 4, sizeCol = col("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == rows.map(r => (r._1, r._4)).toSet)
  }

  test("budgetCut spends each source's budget quality-first, stops at the boundary") {
    // one source, quality = doc_id/10 (higher id = better), 10 tokens each
    val docs = (1L to 10L).map(i => (i, "s", i / 10.0, 10L))
      .toDF("doc_id", "source", "q", "nt")
    // budget 35 → the three best docs fit (30 ≤ 35), the fourth (40) doesn't
    val out = TrainingPrep.budgetCut(docs, budgetTokens = 35L, alpha = 0.5,
      quality = col("q"), nTokens = col("nt"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cum_tokens")))
    assert(out.map(_._1).toSet == Set(10L, 9L, 8L), s"kept ${out.toSeq}")
    assert(out.map(_._2).max == 30L)
    // two sources: budgets split by sqrt(n) weights — equal n, equal budgets
    val two = ((1L to 4L).map(i => (i, "a", 1.0, 10L)) ++
      (11L to 14L).map(i => (i, "b", 1.0, 10L)))
      .toDF("doc_id", "source", "q", "nt")
    val kept = TrainingPrep.budgetCut(two, budgetTokens = 40L, alpha = 0.5,
      quality = col("q"), nTokens = col("nt"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(kept.count(_._1 == "a") == 2 && kept.count(_._1 == "b") == 2,
      s"uneven split: ${kept.toSeq}")
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

  test("leak-safe split keeps every near-dup group in one split") {
    val docs = spark.range(1, 401).select(col("id").as("doc_id"))
    // pair doc 2i-1 with 2i: 200 groups of 2, labeled by the min id
    val groups = spark.range(1, 401).select(col("id").as("doc_id"),
      expr("((id + 1) div 2) * 2 - 1").as("group_id"))
    val out = TrainingPrep.leakSafeSplit(docs, groups, 0.8, 0.1)
    assert(out.count() == 400)
    // no group straddles a split boundary
    val straddlers = out.groupBy("group_id")
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1)
    assert(straddlers.isEmpty)
    // the per-doc rule WOULD have straddled some pair — the guard binds
    val perDoc = TrainingPrep.assignSplit(docs, 0.8, 0.1)
    val joined = out.select(col("doc_id"), col("split").as("gsplit"))
      .join(perDoc, "doc_id")
    assert(joined.filter(col("gsplit") =!= col("split")).count() > 0)
    // all three splits occur (the test isn't vacuous)
    assert(out.select("split").distinct().count() == 3)
    // ungrouped docs fall back to their own id — identical to assignSplit
    val solo = TrainingPrep.leakSafeSplit(docs,
      groups.filter(lit(false)), 0.8, 0.1)
    assert(solo.select(col("doc_id"), col("split")).exceptAll(perDoc).isEmpty)
  }

  test("topKSample: exact k per stratum, deterministic, small strata kept whole") {
    val docs = (0 until 200).map(i => (i.toLong, if (i < 190) "big" else "tiny"))
      .toDF("doc_id", "source")
    val out = TrainingPrep.topKSample(docs, "source", k = 20, idCol = "doc_id")
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 20L, "tiny" -> 10L)) // k capped by stratum size
    // ranks are contiguous 1..n per stratum
    val ranks = out.filter(col("source") === "big")
      .select("pick_rank").collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to 20L))
    // deterministic under repartitioning — same picked ids
    val again = TrainingPrep.topKSample(docs.repartition(13), "source", 20, "doc_id")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // the plan never fully sorts a stratum: rank filter → WindowGroupLimit
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }
}
