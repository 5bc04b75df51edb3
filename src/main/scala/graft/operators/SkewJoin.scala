package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting: the big side gets a
  * per-row salt in [0, buckets), the small side is replicated across
  * every bucket, and the join runs on (key, salt) — splitting a hot
  * key's rows over `buckets` reducers instead of one straggler task.
  *
  * Use when AQE's skew-join splitting isn't available or can't help
  * (e.g. the skewed side feeds a non-shuffle operator chain, or the
  * skew is in a broadcast-ineligible mid-size dim). Result is exactly
  * the plain inner join — salting only changes physical placement.
  * Cost: small side inflated ×buckets; keep buckets modest (8–64).
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    // spark_partition_id + a per-partition row number would also work;
    // monotonically_increasing_id is cheapest and needs no shuffle
    val salted = big.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
