package graft

import graft.sources.CorpusIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interchange-edge semantics: enforced schema, corrupt-line
  * quarantine (rows are data, not errors), and RFC-4180 quoting round
  * trips for adversarial text. The parquet-vs-interchange equivalence
  * itself is oracle-checked (q_jsonl_ingest / q_csv_ingest).
  */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("jsonl: malformed lines quarantine with the raw line, clean lines parse") {
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString
    val f = new java.io.PrintWriter(s"$dir/part-000.jsonl")
    f.println("""{"doc_id": 1, "text": "a b", "lang": "en", "source": "web", "n_chars": 3}""")
    f.println("""{"doc_id": broken""")
    f.println("""not json at all""")
    f.println("""{"doc_id": 2, "text": "c", "lang": "de", "source": "web", "n_chars": 1}""")
    f.close()
    // corrupt-only projections on a raw scan are disallowed
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parsed result, as
    // a real quarantine audit would before splitting clean/corrupt
    val df = CorpusIO.readJsonl(spark, dir, schema).cache()
    assert(df.count() == 4, "a malformed line was dropped instead of quarantined")
    val corrupt = df.filter(col(CorpusIO.CorruptCol).isNotNull)
      .select(CorpusIO.CorruptCol).as[String].collect().sorted
    assert(corrupt.length == 2, s"expected 2 quarantined lines, got ${corrupt.toSeq}")
    assert(corrupt.exists(_.contains("broken")) && corrupt.exists(_.startsWith("not json")),
      s"raw malformed lines not preserved: ${corrupt.toSeq}")
    val clean = df.filter(col(CorpusIO.CorruptCol).isNull)
    assert(clean.count() == 2)
    assert(clean.agg(sum("doc_id")).head.getLong(0) == 3L)
  }

  test("csv: embedded separators, quotes and newlines round-trip under quoting") {
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString + "/csv"
    val nasty = Seq(
      (1L, "comma, inside", "en", "web", 13L),
      (2L, "a \"quoted\" word", "en", "web", 15L),
      (3L, "line\nbreak", "de", "books", 10L),
      (4L, "plain", "fr", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusIO.writeCsv(nasty, dir, compression = "none")
    // the module's OWN reader with multiLine on — the embedded-newline
    // row needs the full RFC-4180 parser (per-file parse units)
    val back = CorpusIO.readCsv(spark, dir, schema, multiLine = true).cache()
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 0)
    val got = back.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "comma, inside", 2L -> "a \"quoted\" word",
      3L -> "line\nbreak", 4L -> "plain"), s"quoting round trip drifted: $got")
  }

  test("csv: empty string survives the round trip distinct from NULL") {
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString + "/empty"
    val d = Seq((1L, "", "en", "web", 0L), (2L, null.asInstanceOf[String], "de", "books", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusIO.writeCsv(d, dir, compression = "none")
    val back = CorpusIO.readCsv(spark, dir, schema).cache()
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 0)
    val byId = back.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId(1L) == "", s"empty string came back as ${byId(1L)}")
    assert(byId(2L) == null, s"NULL came back as ${byId(2L)}")
  }

  test("csv: a literal \\N string value round-trips as data, distinct from NULL") {
    // the sentinel collision: nullValue is compared AFTER unquoting, so
    // without the write-side escape a document whose text IS the two
    // chars \N came back as NULL — silent corruption
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString + "/sentinel"
    val d = Seq((1L, "\\N", "en", "web", 2L), (2L, "\\\\N", "de", "books", 3L),
      (3L, null.asInstanceOf[String], "fr", "web", 0L), (4L, "\\Not a sentinel", "en", "web", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusIO.writeCsv(d, dir, compression = "none")
    val back = CorpusIO.readCsv(spark, dir, schema).cache()
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 0)
    val byId = back.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId(1L) == "\\N", s"literal \\N came back as ${byId(1L)}")
    assert(byId(2L) == "\\\\N", s"literal \\\\N came back as ${byId(2L)}")
    assert(byId(3L) == null, "NULL must still ride the sentinel")
    assert(byId(4L) == "\\Not a sentinel", "non-sentinel backslash strings must pass untouched")
  }

  test("csv: default line-split read tears embedded newlines into quarantine, not silence") {
    // the documented multiLine=false contract: a quoted embedded
    // newline cannot round-trip, but the damage must be VISIBLE —
    // fragments land as quarantined/corrupt rows, never silently vanish
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString + "/tear"
    val d = Seq((1L, "line\nbreak", "de", "books", 10L), (2L, "plain", "fr", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusIO.writeCsv(d, dir, compression = "none")
    val back = CorpusIO.readCsv(spark, dir, schema).cache()
    assert(back.count() >= 3, "torn row fragments must surface as rows")
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() >= 1,
      "a torn fragment must be quarantined")
    assert(back.filter(col("text") === "plain").count() == 1)
  }

  test("csv: malformed rows quarantine, schema names win over header") {
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString
    val f = new java.io.PrintWriter(s"$dir/d.csv")
    f.println("id,body,language,src,len") // header names deliberately different
    f.println("1,hello,en,web,5")
    f.println("not_a_long,x,en,web,1")
    f.println("2,world,de,books,5")
    f.close()
    val df = CorpusIO.readCsv(spark, dir, schema).cache()
    assert(df.columns.take(5).toSeq == schema.fieldNames.toSeq, "schema names must win")
    assert(df.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 1)
    assert(df.filter(col(CorpusIO.CorruptCol).isNull).agg(sum("doc_id")).head.getLong(0) == 3L)
  }

  test("ingest-audit plan: one map-side-combined exchange, no row fanout") {
    // the 100 TB shuffle pin behind the multi-GB bench smoke
    // (jsonl_ingest_gb_sec): the quarantining ingest + per-source audit
    // must stay scan → partial agg → ONE exchange → final agg. A plan
    // that fans quarantine rows out (Generate) or joins back to the
    // corpus would turn a poison drop into a shuffle storm; the partial
    // aggregate bounds the exchange to |sources|·|map partitions| rows
    // regardless of corpus size.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString + "/plan"
    val d = Seq((1L, "a", "en", "web", 1L), (2L, "b", "de", "books", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusIO.writeJsonl(d, dir, compression = "none")
    val audit = CorpusIO.roundTripAudit(CorpusIO.readJsonl(spark, dir, schema))
    audit.collect() // executedPlan is final only after execution (AQE)
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: nodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: nodes(s.plan)
      case _ => p +: (p.children ++ p.subqueries).flatMap(nodes)
    }
    val all = nodes(audit.queryExecution.executedPlan)
    // the orderBy("source") on ≤|sources| rows may add a range-exchange
    // tail; the CORPUS-side pin is on hash exchanges
    val hashExchanges = all.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashExchanges.size == 1,
      s"audit must shuffle exactly once, got ${hashExchanges.size}:\n${audit.queryExecution.executedPlan}")
    val aggs = all.collect { case a: BaseAggregateExec => a }
    assert(aggs.exists(_.aggregateExpressions.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      s"audit aggregate must map-side combine:\n${audit.queryExecution.executedPlan}")
    assert(!all.exists(p => p.nodeName.contains("Generate") || p.nodeName.contains("Join")),
      s"audit plan must not fan out or join:\n${audit.queryExecution.executedPlan}")
  }

  test("audit digests: BIGINT in [0, 2^53), two independent slices, garble-sensitive") {
    // the driver-gate stability contract (r13 regression): unfolded
    // DECIMAL(38,0) sums exceed 2^53 and cross-engine numeric
    // normalization through float64 splits bit-identical values — the
    // folded digests must stay exactly representable as doubles
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, s"doc $i text", "en", s"src${i % 3}", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val audit = CorpusIO.roundTripAudit(d).cache()
    for (c <- Seq("row_digest", "row_digest2")) {
      assert(audit.schema(c).dataType == org.apache.spark.sql.types.LongType,
        s"$c must be BIGINT for the driver hasher")
      val bad = audit.filter(col(c) < 0 || col(c) >= (1L << 53)).count()
      assert(bad == 0, s"$c escaped [0, 2^53)")
    }
    // the two slices are independent md5 bit ranges, not copies
    assert(audit.filter(col("row_digest") === col("row_digest2")).count() == 0)
    // one garbled row flips BOTH slices (additive-cancellation hedge)
    val garbled = d.withColumn("text",
      when(col("doc_id") === 7L, lit("doc 7 GARBLED")).otherwise(col("text")))
    val g = CorpusIO.roundTripAudit(garbled)
    val joined = audit.as("a").join(g.as("b"), "source")
      .filter(col("a.row_digest") =!= col("b.row_digest") &&
        col("a.row_digest2") =!= col("b.row_digest2"))
    assert(joined.count() == 1, "a garbled row must change both digest slices of its source")
  }

  test("jsonl: gzip write round-trips through the extension codec chain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpusio").toString + "/jz"
    val d = Seq((1L, "a b", "en", "web", 3L), (2L, "c", "de", "books", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusIO.writeJsonl(d, dir) // gzip default
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), s"no gzip part files in ${files.toSeq}")
    val back = CorpusIO.readJsonl(spark, dir, schema).cache()
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 0)
    assert(back.count() == 2 && back.agg(sum("n_chars")).head.getLong(0) == 4L)
  }
}
