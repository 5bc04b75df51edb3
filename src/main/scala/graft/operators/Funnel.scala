package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline attrition accounting — the observability table every
  * production cleaning pipeline publishes next to its output: for each
  * ordered gate, how many rows entered, survived, and were dropped.
  * (Reference scope analog: the engine's summary/metadata surfaces;
  * this is the training-data-pipeline counterpart for its gates.)
  *
  * Shape: ONE aggregation pass — the cumulative-conjunction flags are
  * per-row boolean expressions, so every stage count comes out of a
  * single map-side-combined `agg` (no per-stage jobs, no repeated
  * corpus scans); the per-stage rows are then exploded from the one
  * aggregated row. At 100 TB the funnel costs exactly one scan of the
  * already-flagged input, regardless of stage count.
  */
object Funnel {

  /** `stages` = ordered (name, predicate); each stage's input is the
    * survivor set of the previous one. Predicates must be plain row
    * expressions — join-dependent gates (semi/anti) enter as indicator
    * columns on `df` (left-join markers) tested with isNull/isNotNull.
    * Output (ORDERED): stage_idx, stage, rows_in, rows_out, dropped.
    */
  def funnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val cum = stages.scanLeft(lit(true)) { case (acc, (_, p)) => acc && p }.tail
    val aggCols = count(lit(1)).as("c0") +:
      cum.zipWithIndex.map { case (f, i) =>
        coalesce(sum(f.cast("long")), lit(0L)).as(s"c${i + 1}")
      }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    one.select(explode(stageRows(stages)).as("r")).select("r.*").orderBy("stage_idx")
  }

  /** Grouped funnel: the same one-pass cumulative-conjunction counts
    * keyed by `groupCol` — per-cohort gate accounting (which SOURCE is
    * dying at which gate) at the cost of one bounded-key aggregation
    * instead of a global one. Output (ORDERED): group, stage_idx,
    * stage, rows_in, rows_out, dropped.
    */
  def funnelBy(df: DataFrame, groupCol: String,
               stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val cum = stages.scanLeft(lit(true)) { case (acc, (_, p)) => acc && p }.tail
    val aggCols = count(lit(1)).as("c0") +:
      cum.zipWithIndex.map { case (f, i) =>
        coalesce(sum(f.cast("long")), lit(0L)).as(s"c${i + 1}")
      }
    df.groupBy(col(groupCol).as("group"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("group"), explode(stageRows(stages)).as("r"))
      .select(col("group") +: (1 to 5).map(i => col(s"r.${stageFields(i - 1)}")): _*)
      .orderBy("group", "stage_idx")
  }

  private val stageFields =
    Seq("stage_idx", "stage", "rows_in", "rows_out", "dropped")

  private def stageRows(stages: Seq[(String, Column)]): Column =
    array(stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit((i + 1).toLong).as("stage_idx"), lit(name).as("stage"),
        col(s"c$i").as("rows_in"), col(s"c${i + 1}").as("rows_out"),
        (col(s"c$i") - col(s"c${i + 1}")).as("dropped"))
    }: _*)
}
