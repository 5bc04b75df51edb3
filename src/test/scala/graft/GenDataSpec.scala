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
}
