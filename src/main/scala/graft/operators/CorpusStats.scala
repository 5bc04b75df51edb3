package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level analysis operators (north-star extension scope): the
  * reporting layer a training-data pipeline runs over a cleaned corpus
  * — cross-source leakage and per-source vocabulary profiles.
  */
object CorpusStats {

  /** Cross-source contamination matrix: for every pair of sources, how
    * many DISTINCT word-3-gram shingles they share — the "is my
    * validation split leaking into train" report generalized to all
    * split pairs at once.
    *
    * Scale shape: the join operand is the deduplicated (source,
    * shingle) set — bounded by sources × vocabulary, NOT corpus size —
    * and the self-join key is the shingle, so each shingle's source
    * list meets only itself (srcs² pairs per shingle, srcs is small).
    * The per-doc explode never shuffles: it collapses map-side into
    * the distinct aggregation.
    *
    * Output: source_a, source_b (a < b), n_shared.
    */
  def sourceOverlapMatrix(docs: DataFrame, textCol: String = "text",
                          sourceCol: String = "source"): DataFrame = {
    // both sides of the self-join read this — pool-persisted, or the
    // explode + distinct aggregation runs twice
    val sh = CachePool.track(docs
      .select(col(sourceCol).as("src"), explode(Dedup.shingles3(col(textCol))).as("shingle"))
      .distinct())
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Exact per-source token-count percentiles — the length-distribution
    * report a data-quality dashboard tracks per split. Percentile p is
    * the DISCRETE order statistic at rank ⌈p·n/100⌉, computed with pure
    * integer arithmetic ((n·p + 99) div 100 — no float ranks), so the
    * result is engine-identical; ties in the sort are harmless because
    * any row at the selected rank carries the same value.
    *
    * Scale shape: one per-source sort (the rank window) and one
    * aggregation — each source's partition sorts independently, no
    * global ordering. Output: source, p25, p50, p90, p99.
    */
  def lengthPercentiles(docs: DataFrame, ps: Seq[Int] = Seq(25, 50, 90, 99),
                        textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    val ranked = docs
      .select(col(sourceCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("nt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("nt"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
    val aggs = ps.map(p =>
      max(when(col("rn") === expr(s"(n * $p + 99) div 100"), col("nt"))).as(s"p$p"))
    ranked.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("source"))
  }

  /** Top-`k` terms per source by tf-idf — the per-split vocabulary
    * fingerprint. tf is the term's occurrence count within the source,
    * idf = ln(N / df) over the whole corpus (df = docs containing the
    * term).
    *
    * Cross-engine exactness: tf, df, N are integers; N/df is one
    * correctly-rounded division; ln is the only transcendental and is
    * rounded to the 1e-5 lattice (both engines' libm agree to ≤ 1 ulp,
    * far inside the rounding); the score is then a product of
    * bit-identical doubles. Ties break on the term string.
    *
    * Scale shape: both aggregations key on terms, so shuffle volume is
    * bounded by vocabulary (not corpus) after map-side partial
    * aggregation; the df side deduplicates (doc, term) pairs map-side
    * the same way. The final top-k window partitions by source.
    *
    * Output: source, term, tf, idf, tfidf — k rows per source.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int, textCol: String = "text",
                    sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(sourceCol).as("source"), col(idCol).as("doc"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.select(col("doc"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = round(log(col("n").cast("double") / col("df")) * lit(100000.0)) / lit(100000.0)
    val w = Window.partitionBy(col("source")).orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("source"), col("term"), col("tf"), idf.as("idf"))
      .withColumn("tfidf", col("tf") * col("idf"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("source"), col("term"), col("tf"), col("idf"), col("tfidf"))
      .orderBy(col("source"), col("term"))
  }
}
