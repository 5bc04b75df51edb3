package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the release-engineering operator of a
  * training-data pipeline: given two dataset snapshots, classify every
  * doc as added / removed / modified / unchanged by content digest.
  * This is how a 100 TB corpus release is audited (what changed since
  * the last cut?) and how incremental downstream work is scoped (only
  * 'added' + 'modified' need re-processing).
  *
  * Shape: one digest projection per side (no text ever shuffles — the
  * 128-bit digest is the join payload) and ONE full-outer sort-merge
  * join on the doc id. Nothing quadratic, nothing collected.
  */
object Snapshot {

  /** Diff snapshot `b` (new) against `a` (old). Output (UNORDERED):
    * doc_id, status ('added'|'removed'|'modified'|'unchanged'),
    * old_digest, new_digest ('' when absent on that side).
    */
  def diff(a: DataFrame, b: DataFrame,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val oa = a.select(col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as("old_digest"))
    val ob = b.select(col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as("new_digest"))
    oa.join(ob, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("modified"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("old_digest"), lit("")).as("old_digest"),
        coalesce(col("new_digest"), lit("")).as("new_digest"))
  }
}
