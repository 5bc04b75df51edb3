package graft

import graft.streaming.EventStream
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured Streaming demo: the watermarked tumbling-window agg over
  * a file stream matches the oracle-checked batch definition
  * ([[graft.queries.Events.qStreamWindow]]) on the same finite input.
  */
class StreamingSpec extends SparkSpec {

  test("streaming JSONL drop-directory ingest: quarantine + batch equivalence") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-jsonl-drop")
    // drop 1: clean file; drop 2: one poison line in the middle
    val f1 = new java.io.PrintWriter(dir.resolve("drop-001.jsonl").toFile)
    f1.println("""{"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "web", "n_chars": 16}""")
    f1.println("""{"doc_id": 2, "text": "delta epsilon", "lang": "de", "source": "books", "n_chars": 13}""")
    f1.close()
    val f2 = new java.io.PrintWriter(dir.resolve("drop-002.jsonl").toFile)
    f2.println("""{"doc_id": 3, "text": "zeta", "lang": "fr", "source": "web", "n_chars": 4}""")
    f2.println("""{"oops: not json""")
    f2.println("""{"doc_id": 4, "text": "eta theta", "lang": "en", "source": "web", "n_chars": 9}""")
    f2.close()

    val q = graft.streaming.DocStream.readJsonlDocs(spark, dir.toString)
      .writeStream.outputMode("append").format("memory").queryName("jsonl_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("jsonl_out").cache()
      // a poison line must neither kill the query nor vanish
      assert(q.exception.isEmpty, s"stream died on the poison line: ${q.exception}")
      assert(out.count() == 5, "poison line dropped instead of quarantined")
      val bad = out.filter(col("_corrupt").isNotNull)
      assert(bad.count() == 1 &&
        bad.select("_corrupt").head.getString(0).contains("oops"),
        "quarantined line not preserved verbatim")
      // clean rows ≡ the batch reader over the same directory
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      val batch = graft.sources.CorpusIO.readJsonl(spark, dir.toString, schema).cache()
      val a = out.filter(col("_corrupt").isNull)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      val b = batch.filter(col("_corrupt").isNull)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(a.toSeq == b.toSeq, "streamed clean rows drifted from the batch reader")
    } finally q.stop()
  }

  test("streaming windowed agg matches batch on finite input") {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.startMemorySink(
      EventStream.windowedAgg(EventStream.readEvents(spark, dir.toString)), "stream_out")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out")

      // the shared probing loader — same read the oracle-checked batch
      // queries use, whatever the fixture's physical ts type is
      val batchEvents = graft.SparkEntry.events(spark, dir.toString)
      val batch = graft.queries.Events.qStreamWindow(batchEvents)

      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming hopping agg matches the batch sliding windows on finite input") {
    val dir = Files.createTempDirectory("graft-streamhop")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.startMemorySink(
      EventStream.hoppingAgg(EventStream.readEvents(spark, dir.toString)), "streamhop_out")
    try {
      q.processAllAvailable()
      val streamed = spark.table("streamhop_out")
      val batch = graft.queries.Events.qHopWindow(
        graft.SparkEntry.events(spark, dir.toString))
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("watermark dedup collapses a replayed source to distinct events") {
    val dir = Files.createTempDirectory("graft-stream3")
    // same file twice = an at-least-once source replay
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events_b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.dedupEvents(EventStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      val distinct = spark.read.parquet(s"$dir/events_a.parquet").count()
      assert(n == distinct)
    } finally q.stop()
  }

  test("streaming doc dedup drops replayed + same-signature docs online") {
    val dir = Files.createTempDirectory("graft-stream5")
    // replayed corpus = at-least-once ingestion
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs_b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = graft.streaming.DocStream.dedupDocs(
        graft.streaming.DocStream.readDocs(spark, dir.toString))
      .writeStream.outputMode("append").format("memory").queryName("docdedup_out").start()
    try {
      q.processAllAvailable()
      val survivors = spark.table("docdedup_out")
      // batch twin: one survivor per distinct signature key
      val batch = spark.read.parquet(s"$dir/docs_a.parquet")
        .withColumn("dedup_key", graft.streaming.DocStream.dedupKey(
          org.apache.spark.sql.functions.col("text")))
        .select("dedup_key").distinct()
      assert(survivors.count() == batch.count())
      assert(survivors.select("dedup_key").exceptAll(batch).isEmpty)
    } finally q.stop()
  }

  test("streaming URL gate collapses spelling variants to one fetch per page") {
    import org.apache.spark.sql.functions.{col, concat, lit, upper, when}
    val dir = Files.createTempDirectory("graft-streamurl")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs_b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // three spelling variants of page doc_id % 50 (same derivation shape
    // as q_url_dedup): every page arrives under several raw spellings
    def withUrl(df: org.apache.spark.sql.DataFrame) = {
      val page = (col("doc_id") % 50).cast("string")
      df.withColumn("url",
        when(col("doc_id") % 3 === 0,
          concat(lit("HTTP://WWW."), upper(col("source")),
            lit(".EXAMPLE.COM:80/p/"), page, lit("/index.html?utm_source=f")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("https://"), col("source"), lit(".example.com/p/"), page, lit("/")))
          .otherwise(
            concat(lit("https://"), col("source"), lit(".example.com/p/"), page, lit("#frag"))))
    }

    val q = graft.streaming.DocStream.urlGate(
        withUrl(graft.streaming.DocStream.readDocs(spark, dir.toString)))
      .writeStream.outputMode("append").format("memory").queryName("urlgate_out").start()
    try {
      q.processAllAvailable()
      val survivors = spark.table("urlgate_out")
      // batch twin: one survivor per distinct canonical URL
      val batch = withUrl(spark.read.parquet(s"$dir/docs_a.parquet"))
        .select(graft.operators.UrlOps.canonical(col("url")).as("canon_url")).distinct()
      assert(survivors.count() == batch.count())
      assert(survivors.select("canon_url").exceptAll(batch).isEmpty)
      // and the gate genuinely collapsed: fewer fetches than arrivals
      assert(survivors.count() < spark.read.parquet(s"$dir/docs_a.parquet").count())
    } finally q.stop()
  }

  test("streaming domain cap admits first-K per domain, state survives batches") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import org.apache.spark.sql.expressions.Window
    val dir = Files.createTempDirectory("graft-streamcap")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs_a.parquet"), StandardCopyOption.REPLACE_EXISTING)

    def withUrl(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.com/p/"), col("doc_id").cast("string")))

    val q = graft.streaming.DocStream.domainCapGate(
        withUrl(graft.streaming.DocStream.readDocs(spark, dir.toString)), maxPerDomain = 4)
      .writeStream.outputMode("append").format("memory").queryName("domcap_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("domcap_out")
      // batch twin: first 4 per domain in (ingest_us, doc_id) order
      val batch = withUrl(spark.read.parquet(s"$dir/docs_a.parquet"))
        .withColumn("ingest_us",
          (org.apache.spark.sql.functions.lit(1704067200L) + col("doc_id") % 3600) * 1000000L)
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("admitted_rank", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy(col("domain")).orderBy(col("ingest_us"), col("doc_id"))).cast("long"))
        .filter(col("admitted_rank") <= 4)
        .select(col("domain"), col("doc_id"), col("admitted_rank"))
      assert(got.count() == batch.count())
      assert(got.select("domain", "doc_id", "admitted_rank").exceptAll(batch).isEmpty)
      // every domain capped at exactly 4 (the fixture has >=4 docs per source)
      val perDomain = got.groupBy("domain").count().collect()
      assert(perDomain.nonEmpty && perDomain.forall(_.getLong(1) == 4L))
    } finally q.stop()
  }

  test("streaming corpus gate drops exactly the indexed signatures") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-stream6")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val all = spark.read.parquet(s"$dir/docs.parquet")
    val idx = Files.createTempDirectory("graft-stream6-idx").toString
    graft.sources.DedupIndex.save(all.filter(col("doc_id") % 13 =!= 0), idx)

    val q = graft.streaming.DocStream.gateAgainstIndex(spark,
        graft.streaming.DocStream.readDocs(spark, dir.toString), idx)
      .writeStream.outputMode("append").format("memory").queryName("gate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gate_out").select("doc_id")
      // batch twin: identical formulation on the static frame
      val batch = all
        .withColumn("sigkey", graft.streaming.DocStream.dedupKey(col("text")))
        .join(spark.read.parquet(s"$idx/sigkeys"), Seq("sigkey"), "left_anti")
        .select("doc_id")
      assert(streamed.count() == batch.count() && streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // every corpus doc's signature is gated out
      val corpusIds = all.filter(col("doc_id") % 13 =!= 0).select("doc_id")
      assert(streamed.intersect(corpusIds).isEmpty)
    } finally q.stop()
  }

  test("streaming gate funnel converges to the batch funnel totals") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-stream7")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val all = spark.read.parquet(s"$dir/docs.parquet")
    val idx = Files.createTempDirectory("graft-stream7-idx").toString
    graft.sources.DedupIndex.save(all.filter(col("doc_id") % 13 =!= 0), idx)

    val q = graft.streaming.DocStream.gateFunnel(spark,
        graft.streaming.DocStream.readDocs(spark, dir.toString), idx)
      .writeStream.outputMode("complete").format("memory").queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("funnel_out").collect().head
      val batch = graft.streaming.DocStream.gateFunnel(spark, all, idx).collect().head
      assert(streamed == batch, s"stream $streamed != batch $batch")
      // the funnel is genuinely decreasing and non-degenerate here
      assert(batch.getLong(0) > batch.getLong(1) && batch.getLong(1) > 0)
      assert(batch.getLong(2) >= batch.getLong(3) && batch.getLong(3) > 0)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join") {
    val dir = Files.createTempDirectory("graft-stream4")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.clickToPurchaseJoin(EventStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
      // the shared probing loader — same read the oracle-checked batch
      // queries use, whatever the fixture's physical ts type is
      val batchEvents = graft.SparkEntry.events(spark, dir.toString)
      val batch = EventStream.clickToPurchaseJoin(batchEvents)
      assert(streamed.count() == batch.count() && streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("stateful sessionization matches batch (modulo each user's open session)") {
    val dir = Files.createTempDirectory("graft-stream2")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val sess = EventStream.sessionize(EventStream.readEvents(spark, dir.toString))
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")

      // the shared probing loader — same read the oracle-checked batch
      // queries use, whatever the fixture's physical ts type is
      val batchEvents = graft.SparkEntry.events(spark, dir.toString)
      val batch = graft.queries.Events.qSessionize(batchEvents)

      val nUsers = batchEvents.select("user_id").distinct().count()
      // each user's final session either stays open in state or closes
      // via event-time timeout once the watermark passes it, so the
      // emitted count lands between batch−users and batch
      assert(streamed.count() >= batch.count() - nUsers)
      assert(streamed.count() <= batch.count())
      // every emitted session exists in the batch result (same start/size)
      val joined = streamed.as("s").join(batch.as("b"),
        org.apache.spark.sql.functions.expr(
          "s.user_id = b.user_id AND s.t_start = b.t_start AND s.n_events = b.n_events"))
      assert(joined.count() == streamed.count())
    } finally q.stop()
  }

  test("streaming transition pairs: per-user state spans micro-batches, counts match batch") {
    import org.apache.spark.sql.functions.{col, unix_micros, count => cnt, lit}
    val dir = Files.createTempDirectory("graft-streamtrans")
    val tmp = Files.createTempDirectory("graft-streamtrans-src")
    // halves split at the time midpoint → every user's sequence crosses
    // the files in ts order, so cross-batch pairs exercise the state
    val savedTsType = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val all = graft.SparkEntry.events(spark, "/root/testdata/sf0.001")
    val Array(loUs, hiUs) = all
      .agg(org.apache.spark.sql.functions.min(unix_micros(col("ts"))),
        org.apache.spark.sql.functions.max(unix_micros(col("ts"))))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val midUs = (loUs + hiUs) / 2
    def writeHalf(half: org.apache.spark.sql.DataFrame, name: String): java.nio.file.Path = {
      val out = tmp.resolve(name)
      half.coalesce(1).write.mode("overwrite").parquet(out.toString)
      Files.list(out).filter(_.toString.endsWith(".parquet")).findFirst.get
    }
    val fileA = writeHalf(all.filter(unix_micros(col("ts")) <= midUs), "a")
    val fileB = writeHalf(all.filter(unix_micros(col("ts")) > midUs), "b")

    Files.copy(fileA, dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.transitionPairs(EventStream.readEvents(spark, dir.toString))
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    try {
      q.processAllAvailable() // micro-batch 1: first halves only
      val afterA = spark.table("trans_out").count()
      Files.copy(fileB, dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable() // micro-batch 2: state bridges the halves
      val streamed = spark.table("trans_out")
        .groupBy(col("from_type"), col("to_type")).agg(cnt(lit(1)).as("n_pairs"))
      val batch = graft.queries.Events.qTransitions(all)
        .select(col("from_type"), col("to_type"), col("n_pairs"))
      // exact equality — a transition completes the moment its second
      // event arrives, so there is NO open-tail discrepancy
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // and the second batch genuinely added pairs (state was used)
      assert(spark.table("trans_out").count() > afterA)
    } finally {
      q.stop()
      // the shared session outlives this test — restore the write type
      savedTsType match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  test("streaming temperature resampling with frozen rates matches batch") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-stream-mix")
    val full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    full.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)

    // policy fit ONCE on the snapshot, then frozen for the stream
    val rates = graft.operators.TrainingPrep
      .mixRates(full, alpha = 0.5, targetFrac = 0.5).persist()
    rates.count()

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = graft.streaming.DocStream.resampleDocs(batch, rates).collect()
        out.synchronized {
          out ++= kept.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rate_ppm")))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val batchKept = graft.operators.TrainingPrep
        .temperatureMixWith(full, rates).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rate_ppm")))
      assert(out.toSet == batchKept.toSet) // arrival order cannot change the sample
      assert(out.size == batchKept.length)
      assert(out.nonEmpty && out.size < full.count())
    } finally {
      q.stop()
      rates.unpersist()
    }
  }

  test("streaming vector ingest: foreachBatch index appends serve like a rebuild") {
    import org.apache.spark.sql.functions.col
    // the online half of the vector-index lifecycle end to end: an
    // index built on a base corpus, a STREAM of new embedding batches
    // folded in against the frozen quantizer (VectorIndex.append in
    // foreachBatch — the Structured Streaming idiom for transactional
    // sink work), and warm serving reflecting every appended vector
    // exactly as a full rebuild would.
    import spark.implicits._
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(j => (((seed * 31 + j * 7) % 19) - 9) / 10.0f)
    val base = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-stream-vix").toString
    graft.sources.VectorIndex.save(base, idx, k = 4, dims = dims)

    // stream two append batches of new vectors (ids 40..59)
    val streamDir = Files.createTempDirectory("graft-stream-vix-in")
    (40L until 50L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(streamDir.toString)
    (50L until 60L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(streamDir.toString)

    val q = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1) // one micro-batch per file
      .parquet(streamDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sources.VectorIndex.append(batch, idx, dims = dims)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      def serve(dir: String) = graft.sources.VectorIndex.annServe(spark, dir,
        queryVecId = 41L, probes = 2, topK = 8, dims = dims)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val streamed = serve(idx)
      assert(streamed.exists(_._1 >= 40L), "streamed batches absent from serving")
      // ≡ a full rebuild over base + both batches
      val fullDir = Files.createTempDirectory("graft-stream-vix-full").toString
      val full = base.unionByName(
        (40L until 60L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding"))
      graft.sources.VectorIndex.save(full, fullDir, k = 4, dims = dims)
      assert(streamed == serve(fullDir), "stream-appended index diverged from rebuild")
      // and compaction (the post-append maintenance step) changes nothing
      graft.sources.VectorIndex.compact(spark, idx)
      assert(serve(idx) == streamed, "compaction changed answers")
    } finally q.stop()
  }

  test("streaming PQ encoding with a frozen codebook matches batch encoding") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-stream-pq")
    // split the corpus into two ingest batches
    // two append writes → part files land flat in the stream dir (the
    // file source does not recurse into nested dataset directories)
    val full = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    full.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)

    // codebook trained ONCE on the full corpus, then frozen — the
    // online-ingest contract: encoding is stateless per row
    val codebook = graft.operators.Similarity
      .pqTrain(full, m = 8, k = 16, iters = 1, dims = 64)
      .persist()
    codebook.count()

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .option("maxFilesPerTrigger", 1) // force one batch per half
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enc = graft.operators.Similarity
          .pqEncodeWith(batch, codebook, m = 8, k = 16, dims = 64).collect()
        out.synchronized {
          out ++= enc.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub"),
            r.getAs[Long]("code")))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val batchEnc = graft.operators.Similarity
        .pqEncodeWith(full, codebook, m = 8, k = 16, dims = 64).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub"), r.getAs[Long]("code")))
      assert(out.toSet == batchEnc.toSet) // batch-wise ≡ whole-corpus, row for row
      assert(out.size == batchEnc.length)
    } finally {
      q.stop()
      codebook.unpersist()
    }
  }

  test("streaming quality gate matches batch (stateless per-row rules)") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-stream-gate")
    val full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    full.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)

    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the gate is pure per-row integer arithmetic — stateless per
        // micro-batch, so arrival order cannot change who passes
        val kept = graft.operators.QualityRules.gopherFlags(batch)
          .filter(col("passes")).collect()
        out.synchronized { out ++= kept.map(_.getAs[Long]("doc_id")) }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val batchKept = graft.operators.QualityRules.gopherFlags(full)
        .filter(col("passes")).collect().map(_.getAs[Long]("doc_id"))
      assert(out.toSet == batchKept.toSet)
      assert(out.size == batchKept.length)
      assert(out.nonEmpty && out.size < full.count())
    } finally q.stop()
  }

  test("streaming BPE encoding with frozen merges matches batch") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-stream-bpe")
    val full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    full.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)

    // merge table trained ONCE on the snapshot, then frozen — the
    // deployed-tokenizer contract: encoding is stateless per row
    val merges = graft.operators.BpeTokenizer.trainMerges(full, n = 8)

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enc = graft.operators.BpeTokenizer.encode(batch, merges).collect()
        out.synchronized {
          out ++= enc.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bpe"),
            r.getAs[String]("bpe_hash")))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val batchEnc = graft.operators.BpeTokenizer.encode(full, merges).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bpe"),
          r.getAs[String]("bpe_hash")))
      assert(out.toSet == batchEnc.toSet)
      assert(out.size == batchEnc.length)
    } finally q.stop()
  }

  test("streaming count-min cells converge to the batch sketch cell for cell") {
    val dir = Files.createTempDirectory("graft-stream-cms")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("docs.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = graft.streaming.DocStream.cmsCells(
        graft.streaming.DocStream.readDocs(spark, dir.toString), width = 64, depth = 2)
      .writeStream.outputMode("complete").format("memory").queryName("cms_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
      // batch twin: the same cell expression over the static corpus —
      // integer cell sums are arrival-order-free
      val batch = graft.streaming.DocStream.cmsCells(
        spark.read.parquet(s"$dir/docs.parquet"), width = 64, depth = 2)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming basket-rule counts merge to the batch rules (order-atomic batches)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.Relational
    // 40 orders, 2-4 brands each (deterministic), arriving as two
    // order-atomic micro-batches (orders never straddle a batch — the
    // natural ingest unit). Pair/item/total counts are plain sums, so
    // the merged state must reproduce the one-pass batch rules exactly.
    val baskets = (1 to 40).flatMap { o =>
      (0 until 2 + o % 3).map(i => (o.toLong, s"Brand#${(o * 7 + i * 3) % 5}"))
    }.toDF("l_orderkey", "p_brand").distinct()
    val dir = Files.createTempDirectory("graft-stream-basket")
    baskets.filter(col("l_orderkey") % 2 === 0).write.parquet(s"$dir/b0.parquet")
    baskets.filter(col("l_orderkey") % 2 === 1).write.parquet(s"$dir/b1.parquet")

    var pairs: Option[org.apache.spark.sql.DataFrame] = None
    var items: Option[org.apache.spark.sql.DataFrame] = None
    var total = 0L
    val q = spark.readStream
      .schema(baskets.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*.parquet")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        val p = Relational.basketPairCounts(b)
        val it = Relational.basketItemCounts(b)
        pairs = Some(pairs.fold(p)(prev => prev.unionByName(p)
          .groupBy("brand_a", "brand_b").agg(sum(col("pair_count")).as("pair_count"))))
        items = Some(items.fold(it)(prev => prev.unionByName(it)
          .groupBy("p_brand").agg(sum(col("cnt")).as("cnt"))))
        total += Relational.basketTotals(b).head().getLong(0)
        pairs.foreach(x => { x.persist().count(); () })
        items.foreach(x => { x.persist().count(); () })
        b.unpersist(); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val merged = Relational.basketRulesFromCounts(pairs.get, items.get,
      Seq(total).toDF("n_orders")).collect().toSeq
    val batch = Relational.basketRulesFromCounts(
      Relational.basketPairCounts(baskets), Relational.basketItemCounts(baskets),
      Relational.basketTotals(baskets)).collect().toSeq
    assert(merged == batch && merged.nonEmpty)
  }

  test("streaming HLL registers merge to the whole-corpus sketch exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft-stream-hll")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$dir/d0.parquet")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$dir/d1.parquet")
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.select(col("source"), explode(split(col("text"), " ")).as("tok"))

    var regs: Option[org.apache.spark.sql.DataFrame] = None
    val q = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*.parquet")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = graft.operators.Hll.registers(toks(batch), Seq("source"), col("tok"))
        regs = Some(regs.fold(b)(prev =>
          graft.operators.Hll.merge(prev, b, Seq("source"))))
        regs.foreach(x => { x.persist().count(); () }) // pin before the batch frame dies
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // register max is associative + every accumulator exact, so the
    // per-micro-batch merge must finalize BIT-IDENTICALLY to the
    // one-pass corpus sketch — the streaming cardinality gate at 100 TB
    val streamed = graft.operators.Hll
      .finalizeEstimate(regs.get, Seq("source")).collect().toSeq.sortBy(_.getString(0))
    val batch = graft.operators.Hll
      .finalizeEstimate(graft.operators.Hll.registers(toks(docs), Seq("source"), col("tok")),
        Seq("source")).collect().toSeq.sortBy(_.getString(0))
    assert(streamed == batch && streamed.nonEmpty)
  }
}
