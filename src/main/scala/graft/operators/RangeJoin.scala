package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — the scalable form of
  * `left.t BETWEEN right.lo AND right.hi AND left.key = right.key`.
  *
  * Spark plans the raw form as a sort-merge on the equi-key with the
  * BETWEEN as a post-filter, which degenerates when keys are hot (every
  * (key) pair is a candidate); keyless BETWEEN joins become
  * BroadcastNestedLoop outright. Here each right interval explodes
  * across the fixed-width time buckets it spans and the join becomes an
  * EQUI-join on (key, bucket) + exact residual filter — ordinary
  * shuffle-hash/sort-merge machinery, partitionable at any scale.
  *
  * Lossless and duplicate-free: a matching pair shares exactly the
  * left row's bucket (the interval's explode covers it, once), so no
  * post-dedup is needed. `bucketWidthUs` trades per-interval explode
  * factor (span/width + 1 rows) against candidate density per bucket.
  */
object RangeJoin {

  /** @param t,lo,hi timestamp columns (compared µs-exact)
    * @param maxBucketsPerInterval loud-failure cap on the per-interval
    *        explode factor (the span/width contract, r7 watch-item): a
    *        single pathological interval — an open-ended session, a
    *        mis-parsed epoch — would otherwise silently explode into
    *        span/width rows and dominate the job. Executed row-side via
    *        `assert_true`, so the guard scales with the data and costs
    *        one comparison per interval.
    * @return left ⨝ right rows where t ∈ [lo, hi] and keys match;
    *         all columns of both inputs (names must not clash)
    */
  def bucketed(left: DataFrame, right: DataFrame, key: String,
               t: String, lo: String, hi: String,
               bucketWidthUs: Long = 1800000000L,
               maxBucketsPerInterval: Long = 10000L): DataFrame = {
    val lob = floor(unix_micros(col(lo)) / bucketWidthUs)
    val hib = floor(unix_micros(col(hi)) / bucketWidthUs)
    val nb = hib - lob + lit(1L)
    val lb = left.withColumn("_bucket", floor(unix_micros(col(t)) / bucketWidthUs))
    val rb = right
      .withColumn("_guard", assert_true(nb <= lit(maxBucketsPerInterval),
        concat(lit("RangeJoin: an interval spans "), nb,
          lit(s" buckets (cap $maxBucketsPerInterval); widen bucketWidthUs or pre-split long intervals"))))
      // assert_true yields NULL on pass; the filter forces its
      // evaluation (an unused column would be pruned away)
      .filter(col("_guard").isNull)
      .drop("_guard")
      .withColumn("_bucket", explode(sequence(lob, hib)))
    lb.join(rb, Seq(key, "_bucket"))
      .filter(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("_bucket")
  }
}
