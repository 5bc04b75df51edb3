package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corpus interchange I/O — JSONL and CSV, the two formats LLM corpora
  * actually ship in (every public web corpus distributes
  * `*.jsonl.zst`; annotation/label drops arrive as CSV). Parquet is
  * the engine's native storage ([[Catalog]]); this module is the edge
  * where external data enters and leaves.
  *
  * Design rules for the 100 TB ingest path:
  *  - **Schema is ALWAYS enforced, never inferred.** Spark's JSON/CSV
  *    schema inference is a full extra pass over the input and yields
  *    type drift between drops (a batch whose `id`s all fit INT32
  *    silently narrows the column). Callers pass the expected
  *    [[StructType]]; rows that don't parse land in a quarantine
  *    column instead of failing the job or being dropped.
  *  - **Corrupt rows are data, not errors.** PERMISSIVE mode with a
  *    `columnNameOfCorruptRecord` keeps the malformed source line
  *    verbatim so a pipeline can count, sample, and re-ingest it after
  *    a fix — the operational loop every real crawl drop needs. A
  *    multi-TB ingest that aborts on line 10⁹ (FAILFAST) or silently
  *    loses rows (DROPMALFORMED) is not restartable.
  *  - **Compressed by default** on the write side (gzip — available
  *    through the bundled codecs everywhere; swap to zstd where the
  *    Hadoop native zstd codec is installed, as it is on real
  *    clusters: text-source zstd needs libhadoop, unlike parquet's
  *    bundled zstd-jni).
  */
object CorpusIO {

  val CorruptCol = "_corrupt"

  /** Read line-delimited JSON with an enforced schema; malformed lines
    * arrive with every data column null and the raw line in
    * [[CorruptCol]]. Compressed inputs (`.zst`, `.gz`, …) decode by
    * file extension through the Hadoop codec chain. Spark restriction:
    * a query projecting ONLY [[CorruptCol]] from the raw scan is
    * disallowed (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or persist
    * the parsed frame before a corrupt-only audit.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Write as compressed JSONL. One file per partition — callers
    * control file count with the frame's partitioning, as with any
    * Spark sink.
    */
  def writeJsonl(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Read CSV with an enforced schema (header consumed and ignored for
    * naming — the schema names win); malformed rows quarantine into
    * [[CorruptCol]] like [[readJsonl]].
    *
    * `multiLine` chooses between scale and fidelity for text columns
    * with embedded newlines (which [[writeCsv]]'s RFC-4180 quoting
    * emits):
    *  - `false` (default): files split by line — a 100 TB drop scans in
    *    parallel per block, but a quoted embedded newline is torn into
    *    two rows (typically one data row + one quarantined fragment).
    *    Right for newline-free corpora (the engine's normalized text).
    *  - `true`: the full RFC-4180 parser — embedded newlines
    *    round-trip, but each FILE becomes one parse unit (parallelism =
    *    file count), so shard the write side accordingly.
    * NULL is carried as the `\N` sentinel (the Hive/MySQL dump
    * convention) so `""` stays distinct from NULL on round-trip —
    * under Spark's CSV defaults the read-side `nullValue` is the empty
    * string, which swallows BOTH a quoted `""` and an empty field into
    * NULL and silently corrupts the distinction. Two sentinel edges:
    *  - a string DATA value of `\N` (or `\\N`, …) is backslash-escaped
    *    on write and unescaped here ([[sentinelEscape]]) — quoting
    *    cannot protect it because the parser compares `nullValue`
    *    AFTER unquoting, so without the escape a literal `\N` document
    *    silently became NULL;
    *  - foreign CSVs that mark NULL with EMPTY fields (the Spark/pandas
    *    default) parse those fields as `""` for strings and quarantine
    *    non-string columns under this reader — pass their convention
    *    explicitly when ingesting third-party drops (this reader's
    *    defaults are tuned for [[writeCsv]] round-trips).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, sep: String = ",",
              multiLine: Boolean = false): DataFrame = {
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("sep", sep)
      .option("multiLine", multiLine.toString)
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .csv(path)
    sentinelEscape(raw, schema, unescape = true)
  }

  /** Lossless escape for string values colliding with the `\N` NULL
    * sentinel (write: `\N` → `\\N`, `\\N` → `\\\N`, …; read: the
    * inverse). Anchored single-char-class regex — fails on the first
    * byte for the 99.99…% of values that don't start with a
    * backslash, so the ingest hot path stays codegen'd and cheap.
    * Only the caller-declared STRING columns are touched (never
    * [[CorruptCol]]: quarantined raw lines must stay verbatim).
    */
  private def sentinelEscape(df: DataFrame, schema: StructType,
                             unescape: Boolean): DataFrame = {
    val pat = if (unescape) "^\\\\(\\\\+N)$" else "^(\\\\+N)$"
    val rep = if (unescape) "$1" else "\\\\$1"
    schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == StringType && f.name != CorruptCol)
        d.withColumn(f.name, regexp_replace(col(f.name), pat, rep))
      else d
    }
  }

  /** Write as compressed CSV with a header. Quoting is Spark's
    * RFC-4180 default, so embedded separators/quotes/newlines in text
    * columns are emitted losslessly — but reading embedded newlines
    * back requires [[readCsv]]`(multiLine = true)` (per-file parsing);
    * the default line-split read path tears them. Newline-free text
    * round-trips under the defaults on both sides. String values that
    * ARE the `\N` NULL sentinel (or its escapes) gain one leading
    * backslash ([[sentinelEscape]]) so data can never masquerade as
    * NULL; [[readCsv]] reverses it.
    */
  def writeCsv(df: DataFrame, path: String, compression: String = "gzip",
               sep: String = ","): Unit =
    sentinelEscape(df, df.schema, unescape = false)
      .write.mode("overwrite")
      .option("compression", compression)
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", "\\N")
      .csv(path)

  /** Read ORC (columnar interchange with Hive-ecosystem shops;
    * schema-on-read like parquet, so no quarantine column — file-level
    * schema mismatches surface as analysis errors, not silent drift).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write as zstd ORC (ORC's own codec set — zstd available here via
    * the bundled orc-core, unlike the text sources).
    */
  def writeOrc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** The raw DECIMAL(38,0) digest sums are folded into [0, 2⁵³) before
    * they leave the audit: values above 2⁵³ are not exactly
    * representable as float64, and cross-engine comparison layers that
    * normalize numerics through doubles (pandas, JSON) see Spark and
    * DuckDB disagree on bit-identical decimals at that magnitude
    * (found the hard way: r13's unfolded sums were ~1.6·10¹⁹ and went
    * hash-red in the driver gate despite 0/20 rows differing). The fold
    * happens ONCE on the final merged sum, so the aggregate stays fully
    * mergeable — exactness of the underlying lattice is unchanged.
    */
  private val DigestFold = 1L << 53

  /** Per-source round-trip audit of an interchange copy of `docs`
    * against the original: row counts, exact BIGINT sums, two
    * order-independent all-column row-digest SUMs (md5 over all
    * columns; bits 0–60 and bits 60–120 summed on independent
    * DECIMAL(38,0) lattices — any dropped, duplicated, or garbled row
    * changes them), and the quarantine count. Both frames must carry
    * doc_id/text/lang/source/n_chars.
    *
    * The digests are SUMs, not distinct COUNTs, deliberately: a
    * `countDistinct` over per-row digests plans as a two-phase
    * distinct aggregate whose first exchange carries one row per
    * distinct digest — corpus-proportional shuffle for what should be
    * a bounded audit. The sums are fully mergeable, so the whole audit
    * map-side-combines into ≤ |sources| rows per map partition and
    * shuffles once (CorpusIOSpec pins the plan). Exact at any scale:
    * 2⁶⁰ per row × 10¹² rows ≈ 10³⁰ ≪ 10³⁸. A SUM is additive, so
    * corruptions whose digest deltas cancel exactly on one 60-bit
    * slice pass that slice — that is why there are TWO independent
    * slices: a cancellation must hold on both simultaneously
    * (≈ 2⁻¹⁰⁶ for non-adversarial corruption). The final fold to
    * [0, 2⁵³) is for interchange stability, see [[DigestFold]].
    */
  def roundTripAudit(roundTripped: DataFrame): DataFrame = {
    val digest = md5(concat_ws("|",
      col("doc_id").cast("string"), col("text"), col("lang"),
      col("source"), col("n_chars").cast("string")))
    def slice(from: Int) =
      sum(conv(substring(digest, from, 15), 16, 10).cast("decimal(38,0)"))
    def fold(c: Column) = pmod(c, lit(DigestFold)).cast("long")
    val corrupt = if (roundTripped.columns.contains(CorruptCol))
      col(CorruptCol) else lit(null).cast("string")
    roundTripped
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"),
        fold(slice(1)).as("row_digest"),
        fold(slice(16)).as("row_digest2"),
        count(corrupt).as("n_corrupt"))
      .orderBy("source")
  }
}
