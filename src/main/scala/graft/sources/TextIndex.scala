package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index + warm BM25 serving path — the
  * text-retrieval analog of the pyramid serving mode: build the index
  * ONCE from the corpus, persist it term-clustered, and answer ranked
  * queries as pruned scans of a few terms' postings with no corpus
  * access and no corpus-scale shuffle at query time.
  *
  * Layout: postings are DENORMALIZED (term, doc, tf, df, dl) — each
  * row already carries its term's document frequency and its doc's
  * length, so serving needs NO join back to side tables — and are
  * range-partitioned + sorted by term, so a query's `term IN (...)`
  * predicate prunes files and row groups via parquet min/max stats
  * (the same layout discipline as the tile-sorted pyramid). Corpus
  * constants (N, Σdl) live in a one-row `_stats` table scanned lazily
  * into a broadcast. At 100 TB the postings are the standard inverted
  * index (≈ one row per distinct (doc, term)); a query touches only
  * its terms' slices.
  *
  * Scoring is bit-identical to the batch
  * [[graft.operators.CorpusStats.bm25TopDocs]]: integers persisted
  * exactly through parquet, the identical fixed-shape double chain,
  * lattice-rounded idf, per-term scores snapped to integer 1e-6 units
  * so the per-doc sum is an exact BIGINT.
  */
object TextIndex {

  /** Build the index tables from a corpus: (postings, stats). */
  def build(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val toks = split(col(textCol), " ")
    val dl = docs.select(col(idCol).as("doc"), size(toks).cast("long").as("dl"))
    val tf = docs
      .select(col(idCol).as("doc"), explode(toks).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val postings = tf.join(df, "term").join(dl, "doc")
      .select(col("term"), col("doc"), col("tf"), col("df"), col("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("dl_sum"))
    (postings, stats)
  }

  /** Persist the index term-clustered under `path` (overwrites). */
  def save(docs: DataFrame, path: String, textCol: String = "text",
           idCol: String = "doc_id"): String = {
    val (postings, stats) = build(docs, textCol, idCol)
    postings
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/postings")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    path
  }

  /** Fold a batch of NEW documents INTO the index — the segment model
    * (Lucene-flavored, public knowledge): the batch's postings append
    * term-sorted-within-batch, its (n, dl_sum) lands as another row of
    * the mergeable `_stats` table, and the persisted `df` column is
    * only segment-local from here on — [[bm25Serve]] deliberately
    * recomputes document frequency from the term slices it already
    * scans (exactly the global df, since appended doc_ids are new),
    * so ranking after any number of appends equals a full rebuild.
    * [[compact]] restores the range-sorted layout and the global df
    * column. Contract: batch doc_ids must be new to the index (the
    * same new-ids contract as the other index lifecycles).
    */
  def append(docs: DataFrame, path: String, textCol: String = "text",
             idCol: String = "doc_id"): String = {
    val (postings, stats) = build(docs, textCol, idCol)
    postings
      .sortWithinPartitions("term")
      .write.mode("append").option("compression", "zstd")
      .parquet(s"$path/postings")
    stats.write.mode("append").parquet(s"$path/_stats")
    path
  }

  /** Tombstone delete — score-CORRECT by construction, not just
    * row-hidden: the tombstone row records the doc's length, so the
    * corpus constants subtract exactly (N−1, Σdl−dl), document
    * frequency re-derives from the surviving postings the query scans
    * anyway (the same serve-time-df design that makes appends
    * segment-correct), and tf/dl are per-doc — so serving after a
    * delete is IDENTICAL to a rebuild without the doc, before any
    * compaction (spec'd row for row, scores included). Already-
    * tombstoned ids are skipped, so a replayed delete cannot
    * double-subtract the stats. The dl lookup is one postings scan by
    * doc; a deployment deleting at volume would persist a doc→dl
    * sidecar at save time instead.
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): String = {
    import spark.implicits._
    val tombPath = s"$path/tombstones"
    var idDf = ids.toDF("doc")
    if (new java.io.File(tombPath).exists)
      idDf = idDf.join(spark.read.parquet(tombPath).select(col("doc")), Seq("doc"), "left_anti")
    spark.read.parquet(s"$path/postings")
      .join(broadcast(idDf), Seq("doc"), "left_semi")
      .groupBy(col("doc")).agg(max(col("dl")).as("dl"))
      .write.mode("append").parquet(tombPath)
    path
  }

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] =
    if (new java.io.File(s"$path/tombstones").exists)
      Some(spark.read.parquet(s"$path/tombstones")) else None

  /** Fraction of indexed docs that are tombstoned (0 with no
    * tombstones) — the compaction-pressure signal.
    */
  def deadFraction(spark: SparkSession, path: String): Double =
    tombstones(spark, path) match {
      case None => 0.0
      case Some(t) =>
        val total = spark.read.parquet(s"$path/postings")
          .select(col("doc")).distinct().count()
        if (total == 0L) 0.0 else t.select(col("doc")).distinct().count().toDouble / total
    }

  /** Policy-driven compaction: compact only when the dead fraction
    * crosses `maxDead`. Returns whether it compacted.
    */
  def compactIfStale(spark: SparkSession, path: String, maxDead: Double = 0.2): Boolean = {
    val stale = deadFraction(spark, path) > maxDead
    if (stale) { compact(spark, path); () }
    stale
  }

  /** Re-cluster postings into the term-range probe layout, refresh the
    * global df column, collapse `_stats` to one row, physically drop
    * tombstoned postings and fold their mass out of the stats — then
    * clear the tombstone table in the same staged swap.
    */
  def compact(spark: SparkSession, path: String): String = {
    val tmp = path + ".compact"
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val live = tombstones(spark, path) match {
      case Some(t) => spark.read.parquet(s"$path/postings")
        .join(broadcast(t.select(col("doc"))), Seq("doc"), "left_anti")
      case None => spark.read.parquet(s"$path/postings")
    }
    live
      .withColumn("df", count(lit(1)).over(byTerm))
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$tmp/postings")
    liveStats(spark, path)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stats")
    StagedSwap.swap(path, tmp)
    path
  }

  /** Corpus constants with any tombstoned mass subtracted exactly. */
  private def liveStats(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(s"$path/_stats")
      .agg(sum(col("n")).as("n0"), sum(col("dl_sum")).as("dl_sum0"))
    tombstones(spark, path) match {
      case Some(t) =>
        val tagg = t.agg(count(lit(1)).as("tn"),
          coalesce(sum(col("dl")), lit(0L)).as("tdl"))
        raw.crossJoin(tagg)
          .select((col("n0") - col("tn")).as("n"),
            (col("dl_sum0") - col("tdl")).as("dl_sum"))
      case None => raw.select(col("n0").as("n"), col("dl_sum0").as("dl_sum"))
    }
  }

  /** The warm serving plan: ranked BM25 top-k for a term bag, reading
    * ONLY the persisted index. Fully lazy (prepare once, collect per
    * request); `term IN (...)` reaches the parquet scan and prunes
    * files/row groups on the term-sorted layout. Corpus constants sum
    * over the mergeable `_stats` rows and document frequency is
    * recomputed from the scanned term slices (a window over rows the
    * query reads anyway), so the plan is segment-correct: identical
    * ranking whether the index was built in one shot or grown by
    * [[append]].
    */
  def bm25Serve(spark: SparkSession, path: String, queryTerms: Seq[String],
                topK: Int, k1: Double = 1.2, b: Double = 0.75,
                idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "empty BM25 query")
    val stats = liveStats(spark, path)
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val idf = round(log(lit(1.0) + (col("n").cast("double") - col("df_live") + lit(0.5))
      / (col("df_live") + lit(0.5))) * lit(100000.0)) / lit(100000.0)
    val avgdl = col("dl_sum").cast("double") / col("n")
    val tfd = col("tf").cast("double")
    val score = col("idf") * (tfd * lit(k1 + 1.0)
      / (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))))
    val scanned = spark.read.parquet(s"$path/postings")
      .filter(col("term").isInCollection(queryTerms))
    val livePostings = tombstones(spark, path) match {
      case Some(t) => scanned.join(broadcast(t.select(col("doc"))), Seq("doc"), "left_anti")
      case None => scanned
    }
    livePostings
      .withColumn("df_live", count(lit(1)).over(byTerm))
      .crossJoin(broadcast(stats))
      .select(col("doc"), col("term"), col("tf"), col("dl"),
        col("n"), col("dl_sum"), idf.as("idf"))
      .select(col("doc"), round(score * lit(1000000.0)).cast("long").as("sc"))
      .groupBy(col("doc").as(idCol))
      .agg(sum(col("sc")).as("score_micro"))
      .withColumn("score", col("score_micro").cast("double") / lit(1000000.0))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(topK)
  }
}
