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
}
