package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes text classifier — train + inference in one
  * composed plan. This is the deterministic stand-in for the
  * fastText-style linear quality/domain classifier every large corpus
  * pipeline runs (CCNet, LLaMA data prep): label = `source`, features =
  * whitespace tokens, Laplace(+1) smoothing.
  *
  * Cross-engine exactness (the repo's ln-lattice playbook): every
  * probability is a double division of exact BIGINT counts, snapped to
  * the 1e-5 ln lattice as an integer; per-(doc, class) totals are exact
  * BIGINT sums of lattice units; argmax is a deterministic
  * (total asc, class asc) window rank — hash-exact vs the same CTEs in
  * any engine.
  *
  * Scale shape: train = two token-keyed aggregations (per-class term
  * counts shuffle ≤ |vocab|·k rows after map-side combine; class
  * totals k rows). Inference joins the per-doc DISTINCT-term table
  * (not raw occurrences) against the class-conditional likelihood
  * table on the term key — the k-way class enumeration rides the
  * k-row broadcast class-stats table, never a shuffle. No driver
  * state; k = |classes| is the only fan-out factor.
  */
object Classifier {

  /** Train on (textCol, classCol) and score every row; output
    * (ORDERED by idCol): doc_id, actual, predicted, nll_units
    * (winner's total lattice NLL incl. prior), correct (0/1).
    */
  def nbTrainScore(docs: DataFrame, textCol: String = "text",
                   classCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"), col(classCol).as("cls"),
      explode(split(col(textCol), " ")).as("term"))

    // per-doc distinct-term counts: inference joins |doc-vocab| rows, not occurrences
    val dt = tok.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("n"))
    // class-conditional term counts + class token totals + corpus vocab size
    val tfc = tok.groupBy(col("cls"), col("term")).agg(count(lit(1)).as("tf"))
    val cstat = tok.groupBy(col("cls")).agg(count(lit(1)).as("t_c"))
    val vocabn = tok.agg(countDistinct(col("term")).as("v"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val prior = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(nDocs))
      .select(col("cls"),
        round(-log(col("n_c").cast("double") / col("n_docs").cast("double")) * lit(100000.0))
          .cast("long").as("prior_nll"))

    // Laplace-smoothed token NLL on the lattice; absent (term, cls)
    // pairs fall back to tf = 0 through the left join's coalesce
    val tokenNll = round(-log((coalesce(col("tf"), lit(0L)) + lit(1L)).cast("double") /
      (col("t_c") + col("v")).cast("double")) * lit(100000.0)).cast("long")

    val scored = dt
      .crossJoin(broadcast(cstat))
      .join(tfc, Seq("cls", "term"), "left")
      .crossJoin(broadcast(vocabn))
      .groupBy(col("doc"), col("cls"))
      .agg(sum(col("n") * tokenNll).as("like_nll"))
      .join(broadcast(prior), Seq("cls"))
      .select(col("doc"), col("cls"),
        (col("prior_nll") + col("like_nll")).as("total_nll"))

    val w = Window.partitionBy(col("doc"))
      .orderBy(col("total_nll").asc, col("cls").asc)
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc").as(idCol), col("cls").as("predicted"),
        col("total_nll").as("nll_units"))

    docs.select(col(idCol), col(classCol).as("actual"))
      .join(best, Seq(idCol))
      .select(col(idCol), col("actual"), col("predicted"), col("nll_units"),
        when(col("actual") === col("predicted"), lit(1L)).otherwise(lit(0L)).as("correct"))
      .orderBy(idCol)
  }

  /** Gate-distillation feature row per document — the five integer
    * statistics the [[QualityRules.gopherFlags]] gate thresholds, as
    * BIGINT features (permille/deci ratios via integer division, so
    * every value is engine-exact), plus the ±1 training label `y` =
    * the gate's own verdict. This is the standard corpus-pipeline move
    * of distilling a hand-written quality gate into a linear model
    * that generalizes past the hard thresholds (fastText-style quality
    * classifiers in CCNet/LLaMA data prep are trained exactly this
    * way, from rule- or source-labeled seeds).
    *
    * Output: doc_id, x1 (token count), x2 (distinct-token permille),
    * x3 (distinct stopwords), x4 (mean word length ×10), x5 (1-char
    * token permille), y (±1).
    */
  def gateFeatures(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val t = split(col(textCol), " ")
    docs.select(col(idCol),
        size(t).cast("long").as("n"),
        (length(col(textCol)) - (size(t) - 1)).cast("long").as("sumw"),
        size(array_distinct(t)).cast("long").as("uniq"),
        size(filter(t, x => length(x) <= 1)).cast("long").as("nshort"),
        size(array_intersect(array_distinct(t),
          typedLit(graft.functions.TextAnalysis.stopwords("en")))).cast("long").as("nstop"))
      .select(col(idCol),
        col("n").as("x1"),
        expr("(uniq * 1000) div n").as("x2"),
        col("nstop").as("x3"),
        expr("(sumw * 10) div n").as("x4"),
        expr("(nshort * 1000) div n").as("x5"),
        when(expr(
          """n >= 30 AND n <= 1000 AND sumw >= n * 4 AND sumw <= n * 10
            |AND (n - uniq) * 10 <= n * 6 AND nstop >= 2
            |AND nshort * 20 <= n * 3""".stripMargin),
          lit(1L)).otherwise(lit(-1L)).as("y"))
  }

  /** Full-batch perceptron distillation of the quality gate: `iters`
    * rounds of w ← w + Σ_misclassified y·x over [[gateFeatures]].
    * Weights and updates are exact BIGINT sums (order-independent, so
    * hash-exact across engines and partitionings — no learning-rate
    * float anywhere), and each round is ONE map-side-combined
    * aggregation over the persisted feature table with the current
    * weights folded in as literals: the classic distributed full-batch
    * linear-model shape (k·iters driver round-trips, never a
    * per-example loop). At 100 TB each round is a single scan +
    * 7-column partial agg.
    *
    * Output: one row per iteration — it, n_err (misclassified count
    * under the PRE-update weights; iteration 1 counts everything since
    * w=0 gives margin 0), then the post-update w1..w5, b — ordered by
    * it.
    */
  def perceptronDistill(docs: DataFrame, iters: Int = 5, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = CachePool.track(gateFeatures(docs, textCol, idCol))
    val (_, _, hist) = trainLoop(feats, iters)
    hist.toDF("it", "n_err", "w1", "w2", "w3", "w4", "w5", "b").orderBy("it")
  }

  private val xs = Array("x1", "x2", "x3", "x4", "x5")

  private def marginCol(w: Array[Long], b: Long): org.apache.spark.sql.Column =
    col("y") * (xs.zip(w).map { case (x, wi) => col(x) * lit(wi) }.reduce(_ + _) + lit(b))

  /** The iteration loop shared by training and scoring: one 7-column
    * exact-integer aggregation per round over the persisted features.
    */
  private def trainLoop(feats: DataFrame, iters: Int)
      : (Array[Long], Long, Seq[(Long, Long, Long, Long, Long, Long, Long, Long)]) = {
    val w = Array.fill(5)(0L)
    var b = 0L
    val hist = Seq.newBuilder[(Long, Long, Long, Long, Long, Long, Long, Long)]
    for (it <- 1 to iters) {
      val errCond = marginCol(w, b) <= 0
      val aggs =
        coalesce(sum(when(errCond, lit(1L)).otherwise(lit(0L))), lit(0L)).as("n_err") +:
          xs.map(x => coalesce(sum(when(errCond, col("y") * col(x))), lit(0L)).as(s"d_$x")) :+
          coalesce(sum(when(errCond, col("y"))), lit(0L)).as("d_b")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val nErr = row.getLong(0)
      for (i <- 0 until 5) w(i) += row.getLong(i + 1)
      b += row.getLong(6)
      hist += ((it.toLong, nErr, w(0), w(1), w(2), w(3), w(4), b))
    }
    (w, b, hist.result())
  }

  /** Inference with the trained weights: every document scored against
    * the final iteration's hyperplane — pred = +1 iff w·x + b > 0 on
    * the TRUE margin (y cancels out of [[marginCol]] by multiplying
    * back). One stateless per-row pass; at 100 TB this is the deployed
    * quality-filter shape (weights broadcast as plan literals).
    * Output: doc_id, y, pred, correct — ordered by doc_id.
    */
  def perceptronScore(docs: DataFrame, iters: Int = 5, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val feats = CachePool.track(gateFeatures(docs, textCol, idCol))
    val (w, b, _) = trainLoop(feats, iters)
    // y ∈ {−1, +1}, so y·margin(y=…) = raw score w·x + b
    val raw = col("y") * marginCol(w, b)
    feats.select(col(idCol), col("y"),
        when(raw > 0, lit(1L)).otherwise(lit(-1L)).as("pred"))
      .withColumn("correct",
        when(col("y") === col("pred"), lit(1L)).otherwise(lit(0L)))
      .orderBy(idCol)
  }

  /** Raw decision-function values for ranking-quality evaluation
    * (AUC / PR curves): (id, y, score = w·x + b) with the final
    * iteration's weights folded in as plan literals — the same
    * stateless per-row pass as [[perceptronScore]] but keeping the
    * exact BIGINT margin instead of its sign.
    */
  def perceptronRaw(docs: DataFrame, iters: Int = 5, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val feats = CachePool.track(gateFeatures(docs, textCol, idCol))
    val (w, b, _) = trainLoop(feats, iters)
    feats.select(col(idCol), col("y"), (col("y") * marginCol(w, b)).as("score"))
  }
}
