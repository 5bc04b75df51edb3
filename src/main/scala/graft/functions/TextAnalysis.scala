package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for training-data pipelines
  * (north-star extension scope): token statistics, quality scoring,
  * stopword-based language identification, content fingerprinting.
  * All pure builtin column expressions — per-row, shuffle-free,
  * codegen-friendly.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Stopword lists for the n-gram/stopword language heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que", "por"))

  def stopwordCount(t: Column, lang: String): Column =
    size(filter(t, x => x.isin(stopwords(lang): _*)))

  /** Deterministic stopword-vote language guess with a fixed tie order
    * (en > de > fr > es); all-zero scores → "und" (undetermined).
    */
  def langGuess(t: Column): Column = {
    val en = stopwordCount(t, "en")
    val de = stopwordCount(t, "de")
    val fr = stopwordCount(t, "fr")
    val es = stopwordCount(t, "es")
    when(en + de + fr + es === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Length/diversity/stopword-composite quality score in [0,1] —
    * the usual cheap pretraining-corpus filter signals.
    */
  def qualityScore(t: Column, text: Column): Column = {
    val n = size(t)
    val uniq = size(array_distinct(t))
    val stop = stopwordCount(t, "en")
    lit(0.4) * least(lit(1.0), n * lit(1.0) / lit(50.0)) +
      lit(0.3) * (uniq * lit(1.0) / n) +
      lit(0.3) * (lit(1.0) - stop * lit(1.0) / n)
  }

  /** Rolling-hash-style content fingerprints: full digest, minimum
    * shingle digest (winnowing-style), and head fingerprint.
    */
  def fpFull(text: Column): Column = md5(text)

  def fpMinShingle(t: Column): Column =
    array_min(transform(sequence(lit(1), size(t) - 2), i =>
      md5(concat(element_at(t, i), lit(" "), element_at(t, i + 1), lit(" "),
        element_at(t, i + 2)))))

  def fpPrefix(t: Column): Column = md5(array_join(slice(t, 1, 5), " "))
}
