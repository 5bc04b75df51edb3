package graft

import org.apache.spark.sql.functions._

/** Contracts of the scale-fixture generator: schema parity with the
  * driver fixtures, the measured distribution targets (dup rates,
  * lines-per-order coverage, language mix), and full determinism
  * (same sf → byte-identical values, any row reproducible in
  * isolation). Probed at sf=0.004 (240 orders / 24k lineitem) — the
  * generator is scale-free by construction, so the tiny run pins the
  * same code paths the sf1 fixtures used.
  */
class GenDataSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-gendata").toString
    GenData.generate(spark, d, 0.004)
    d
  }

  private def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

  test("schemas and row counts match the driver fixture contract") {
    val counts = Map("region" -> 5L, "nation" -> 25L, "customer" -> 600L,
      "supplier" -> 40L, "part" -> 800L, "orders" -> 6000L,
      "lineitem" -> 24000L, "events" -> 4000L, "documents" -> 200L,
      "embeddings" -> 80L)
    counts.foreach { case (n, c) => assert(t(n).count() == c, s"$n count") }
    val ref = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(t("lineitem").schema.map(f => (f.name, f.dataType)) ==
      ref.schema.map(f => (f.name, f.dataType)), "lineitem schema drifted")
    val refDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(t("documents").schema.map(f => (f.name, f.dataType)) ==
      refDocs.schema.map(f => (f.name, f.dataType)), "documents schema drifted")
  }

  test("distribution targets: dup structure, coverage, language mix, unit norms") {
    val docs = t("documents")
    // ~0.17% exact dups (i%601==600) and ~4.5% near-dups (i%22==11)
    val nearDups = docs.filter(col("doc_id") % 22 === 11).count()
    assert(nearDups == (0 until 200).count(_ % 22 == 11), s"near-dup count $nearDups")
    assert(docs.filter(col("lang") === "en").count() > 60, "en share")
    // n_chars is the text length everywhere
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0)
    // near-dup shares a long prefix with its predecessor
    val pair = docs.filter(col("doc_id").isin(10L, 11L))
      .orderBy("doc_id").collect().map(_.getAs[String]("text"))
    assert(pair(0).take(30) == pair(1).take(30), "near-dup must copy its base's prefix")
    // lineitem covers most orders, Poisson(4)-ish
    val covered = t("lineitem").select(countDistinct(col("l_orderkey"))).head.getLong(0)
    assert(covered > 5700 && covered < 6000, s"order coverage $covered")
    // embeddings unit-norm
    val badNorm = t("embeddings").select(
      abs(sqrt(aggregate(col("embedding"),
        lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))) - 1.0).as("d"))
      .filter(col("d") > 1e-5).count()
    assert(badNorm == 0, "embeddings must be unit-norm")
  }

  test("fully deterministic: a second generation is value-identical") {
    val d2 = java.nio.file.Files.createTempDirectory("graft-gendata2").toString
    GenData.generate(spark, d2, 0.004)
    Seq("lineitem", "documents", "embeddings").foreach { n =>
      val a = t(n)
      val b = spark.read.parquet(s"$d2/$n.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$n is not deterministic across generations")
    }
  }

  test("openvocab: power-law vocabulary, same schema and duplicate structure") {
    val d3 = java.nio.file.Files.createTempDirectory("graft-gendata-ov").toString
    GenData.generate(spark, d3, 0.04, openVocab = true) // 2000 docs
    val docs = spark.read.parquet(s"$d3/documents.parquet")
    assert(docs.count() == 2000)
    assert(docs.schema.map(f => (f.name, f.dataType)) ==
      t("documents").schema.map(f => (f.name, f.dataType)), "openvocab schema drifted")
    val words = docs.select(explode(split(col("text"), " ")).as("w")).cache()
    val vocab = words.select(countDistinct(col("w"))).head.getLong(0)
    // ~110k tokens drawn Zipf over 50k types land ~15-25k distinct —
    // three orders past the closed fixture's 31
    assert(vocab > 5000, s"openvocab produced only $vocab types")
    // Zipf head: the most frequent type carries >1% of tokens where a
    // uniform 50k draw would give ~0.002%
    val total = words.count()
    val top = words.groupBy("w").count().orderBy(col("count").desc).head.getLong(1)
    assert(top.toDouble / total > 0.01, s"no power-law head: top=$top/$total")
    // duplicate structure is vocabulary-independent: near-dups still
    // copy their base's prefix, exact dups are byte-identical
    val near = docs.filter(col("doc_id").isin(10L, 11L))
      .orderBy("doc_id").collect().map(_.getAs[String]("text"))
    assert(near(0).take(30) == near(1).take(30), "openvocab near-dup lost its copied prefix")
    val exact = docs.filter(col("doc_id").isin(599L, 600L))
      .orderBy("doc_id").collect().map(_.getAs[String]("text"))
    assert(exact(0) == exact(1), "openvocab exact dup drifted")
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0)
  }
}
