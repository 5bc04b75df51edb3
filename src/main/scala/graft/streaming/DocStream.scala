package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion — the streaming twin of the batch dedup
  * suite for continuously-arriving documents (north-star §2.9 extension;
  * a 100 TB training-data pipeline ingests incrementally and must drop
  * duplicates ONLINE, not in a nightly batch).
  *
  * The dedup key is the banded-minhash signature (identical texts hash
  * identically, so near-dup signature dedup subsumes exact dedup); docs
  * too short to shingle fall back to the exact md5 key. State is bounded
  * by the watermark via `dropDuplicatesWithinWatermark` — a duplicate
  * arriving within the watermark interval of its original is dropped,
  * later re-arrivals are the source's replay concern, and state for
  * expired keys is evicted (unbounded-state dedup is the classic
  * streaming-pipeline OOM).
  */
object DocStream {

  /** Streaming source over a documents parquet directory. Ingest event
    * time is synthesized deterministically from doc_id (the fixture
    * corpus carries no timestamp; a production source would supply its
    * own arrival time).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(dir)
      .withColumn("ingest_ts", timestamp_seconds(lit(1704067200L) + col("doc_id") % 3600))

  /** Streaming JSONL ingest over a drop directory — the streaming twin
    * of [[graft.sources.CorpusIO.readJsonl]] and the shape corpus
    * drops actually arrive in (files landing in a bucket, autoloaded
    * as they appear). Schema ENFORCED (inference is illegal on a
    * stream anyway), malformed lines quarantined into `_corrupt`
    * verbatim rather than failing the query — a poison file must not
    * kill a long-running ingest. Event time synthesized like
    * [[readDocs]].
    */
  def readJsonlDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
        "n_chars LONG, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .withColumn("ingest_ts", timestamp_seconds(lit(1704067200L) + col("doc_id") % 3600))

  /** Signature key: banded-minhash signature for shingleable docs, md5
    * fallback for short ones (an all-empty shingle set must not collapse
    * every short doc into one key).
    */
  def dedupKey(text: org.apache.spark.sql.Column, k: Int = 8): org.apache.spark.sql.Column =
    Dedup.signatureKey(text, k)

  /** Watermarked streaming dedup: first doc per signature survives. */
  def dedupDocs(docs: DataFrame, k: Int = 8): DataFrame =
    docs
      .withWatermark("ingest_ts", "1 hour")
      .withColumn("dedup_key", dedupKey(col("text"), k))
      .dropDuplicatesWithinWatermark("dedup_key")

  /** Online Count-Min sketch maintenance — the streaming twin of
    * [[graft.operators.QualityRules.cmsHeavyHitters]]'s build phase:
    * the (depth, bucket) cell table as a continuously-updated streaming
    * aggregation. The sketch is the canonical STREAMING summary — its
    * state is the bounded depth×width cell grid (never the vocabulary),
    * and because each cell is a pure integer sum of md5-determined
    * contributions, the converged stream state equals the batch-built
    * sketch cell for cell regardless of arrival order (StreamingSpec
    * proves it). Complete-mode output: j, b, cell.
    */
  def cmsCells(docs: DataFrame, width: Int = 1024, depth: Int = 4): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("term"))
      .select(col("term"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), pmod(graft.operators.TrainingPrep.hex6Int(
        concat(col("j").cast("string"), lit("|"), col("term"))),
        lit(width.toLong)).as("b"))
      .groupBy(col("j"), col("b"))
      .agg(count(lit(1)).as("cell"))

  /** Streaming incremental dedup against the PERSISTED corpus
    * signature index ([[graft.sources.DedupIndex]]) — the stream-static
    * shape of the batch incremental check: each arriving doc computes
    * its signature key per row (the SAME key [[dedupDocs]] dedups on
    * online: full minhash signature, md5 fallback for unshingleable
    * docs — identical text always collides) and one stream-static
    * LEFT ANTI join against the index's `sigkeys` table drops docs the
    * corpus already contains. Completely STATELESS on the stream side —
    * the corpus is the static index, never rescanned, arrival order
    * irrelevant; the sigkey-sorted layout prunes like every other
    * index probe. Online self-dedup within the stream remains
    * [[dedupDocs]]'s watermark-bounded state; this gate composes after
    * it.
    *
    * Precision contract: signature identity (all k slots agree) — the
    * exact-and-fuzzy-exact online gate. The banded ≥-threshold screen
    * stays a batch/micro-batch concern ([[graft.sources.DedupIndex
    * .incrementalDedup]]): per-band gating on a stream would need a
    * stream-side re-aggregation (stream-stream join) or a broadcast
    * filter structure. StreamingSpec proves stream ≡ the identical
    * batch formulation.
    */
  def gateAgainstIndex(spark: SparkSession, docs: DataFrame,
                       indexPath: String, k: Int = 8): DataFrame = {
    // distinct LIVE keys: per-doc sigkey rows (deletable layout) would
    // otherwise multiply nothing here (anti-join), but tombstoned docs'
    // keys must leave the gate unless a live doc shares them
    val idxSigs = graft.sources.DedupIndex.liveSigkeys(spark, indexPath)
    docs
      .withColumn("sigkey", dedupKey(col("text"), k))
      .join(idxSigs, Seq("sigkey"), "left_anti")
      .drop("sigkey")
  }

  /** Streaming ingest-gate FUNNEL — the observability twin of the gate
    * chain: running totals of arrived → lang-pass → quality-pass →
    * admitted-by-index, as ONE streaming global aggregation over
    * cumulative-conjunction flags (the streaming shape of
    * [[graft.operators.Funnel]]; a wide single row instead of exploded
    * stage rows because complete-mode re-emits the whole result each
    * micro-batch). The flags are stateless per-row expressions plus one
    * stream-static LEFT join against the index's sigkeys, so streaming
    * state is exactly the 4-counter aggregate — bounded forever.
    * Arrival order cannot change any flag, so the converged totals
    * equal the batch funnel (StreamingSpec proves it).
    *
    * Output (complete mode, 1 row): arrived, passed_lang,
    * passed_quality, admitted.
    */
  def gateFunnel(spark: SparkSession, docs: DataFrame,
                 indexPath: String, k: Int = 8): DataFrame = {
    import graft.functions.TextAnalysis
    // distinct projection — per-doc sigkey rows would multiply the
    // LEFT join's counted rows
    val idxSigs = graft.sources.DedupIndex.liveSigkeys(spark, indexPath)
      .withColumn("in_idx", lit(true))
    val t = TextAnalysis.tokens(col("text"))
    docs
      .withColumn("sigkey", dedupKey(col("text"), k))
      .join(idxSigs, Seq("sigkey"), "left")
      .withColumn("f1", col("lang") === "en")
      .withColumn("f2", col("f1") && TextAnalysis.qualityScore(t, col("text")) >= 0.5)
      .withColumn("f3", col("f2") && col("in_idx").isNull)
      .agg(count(lit(1)).as("arrived"),
        coalesce(sum(col("f1").cast("long")), lit(0L)).as("passed_lang"),
        coalesce(sum(col("f2").cast("long")), lit(0L)).as("passed_quality"),
        coalesce(sum(col("f3").cast("long")), lit(0L)).as("admitted"))
  }

  /** Streaming crawl-frontier URL gate — the streaming twin of
    * [[graft.operators.UrlOps.dedupAndCap]]'s dedup stage: canonicalize
    * each arriving URL ([[graft.operators.UrlOps.canonical]], stateless
    * per-row string surgery) and keep only the FIRST sighting per
    * canonical key within the watermark, so spelling variants of one
    * page arriving separately collapse to a single fetch. State is the
    * canonical-key set bounded by the watermark — the same
    * `dropDuplicatesWithinWatermark` contract as [[dedupDocs]] (an
    * unbounded frontier seen-set is the crawl pipeline's classic OOM).
    */
  def urlGate(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .withWatermark("ingest_ts", "1 hour")
      .withColumn("canon_url", graft.operators.UrlOps.canonical(col(urlCol)))
      .dropDuplicatesWithinWatermark("canon_url")

  final case class UrlDoc(domain: String, canon_url: String, doc_id: Long,
                          ingest_us: Long)
  final case class DomainAdmit(domain: String, canon_url: String, doc_id: Long,
                               admitted_rank: Long)

  /** Streaming per-domain admission cap — the online politeness-cap
    * twin of [[graft.operators.UrlOps.dedupAndCap]]'s ranking stage:
    * at most `maxPerDomain` pages are ever admitted per domain, FIRST
    * ARRIVALS win (a crawl frontier cannot rank pages it has not
    * fetched — arrival order replaces the batch's quality order).
    * State is ONE counter per domain (`flatMapGroupsWithState`),
    * bounded by the domain universe forever — never by pages seen.
    * Within a micro-batch the group's rows admit in deterministic
    * (ingest_us, doc_id) order, so stream output is reproducible for a
    * given batch partitioning (the spec feeds one file = one batch and
    * proves equality to the batch window-rank twin).
    */
  def domainCapGate(docs: DataFrame, maxPerDomain: Int,
                    urlCol: String = "url"): org.apache.spark.sql.Dataset[DomainAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(domain: String, rows: Iterator[UrlDoc],
           state: GroupState[Long]): Iterator[DomainAdmit] = {
      var admitted = state.getOption.getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[DomainAdmit]
      for (d <- rows.toSeq.sortBy(r => (r.ingest_us, r.doc_id))
             if admitted < maxPerDomain) {
        admitted += 1
        out += DomainAdmit(domain, d.canon_url, d.doc_id, admitted)
      }
      state.update(admitted)
      out.iterator
    }

    docs
      .withColumn("canon_url", graft.operators.UrlOps.canonical(col(urlCol)))
      .select(
        graft.operators.UrlOps.domainOf(col("canon_url")).as("domain"),
        col("canon_url"), col("doc_id"),
        (unix_timestamp(col("ingest_ts")) * 1000000L).as("ingest_us"))
      .as[UrlDoc]
      .groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Online temperature resampling with a FROZEN policy — the streaming
    * twin of [[graft.operators.TrainingPrep.temperatureMix]]: rates are
    * fit once on a corpus snapshot ([[graft.operators.TrainingPrep
    * .mixRates]]), broadcast, and applied statelessly per micro-batch.
    * Because the keep decision is the deterministic md5 key, streaming
    * arrival order cannot change which documents survive — stream ≡
    * batch row for row (StreamingSpec proves it).
    */
  def resampleDocs(docs: DataFrame, rates: DataFrame): DataFrame =
    graft.operators.TrainingPrep.temperatureMixWith(docs, rates)
}
