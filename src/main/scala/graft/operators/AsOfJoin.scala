package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (time-travel) join: for every left row, the latest right row
  * of the same key with rightTime ≤ leftTime — the operator order
  * books / sensor readings / price lookups need and Spark lacks as a
  * builtin.
  *
  * Relational single-shuffle formulation (preference (a) of the
  * custom-operator ladder — no custom SparkPlan needed): tag and union
  * both sides, one window over (key, time) carrying the last non-null
  * right payload forward, keep left rows. Equal timestamps join
  * (ts ≥ ts_right), so right rows sort before left rows at ties.
  * Scale: one shuffle on the key, no join explosion, skew handled like
  * any window (or pre-salt with [[SkewJoin]] patterns).
  */
object AsOfJoin {

  /** @param left       left rows (keep all — left-outer semantics)
    * @param right      right rows; payload columns are carried over as
    *                   `asof_<name>`
    * @param key        equi-join key column (present on both sides)
    * @param leftTime   left event-time column
    * @param rightTime  right event-time column
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
      .select(Seq(col(key), col("_t"), col("_is_left")) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_is_left", lit(0))
      .select(Seq(col(key), col("_t"), col("_is_left")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"asof_$c")): _*)

    // right rows first at equal timestamps → inclusive ts ≥ ts_right
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(tagged.unionByName(taggedRight)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_left") === 1).drop("_t", "_is_left")
  }
}
