package graft

import graft.operators.CachePool
import org.apache.spark.sql.functions._

class CachePoolSpec extends SparkSpec {

  test("tracking is idempotent for already-persisted frames") {
    val df = spark.range(10).toDF("v").persist()
    df.count()
    val lvl = df.storageLevel
    CachePool.track(df)
    assert(df.storageLevel == lvl) // not re-persisted, no level change
  }

  test("evicted frames recompute correctly on later actions") {
    val dfs = (1 to 15).map(i =>
      CachePool.track(spark.range(100).toDF("v").withColumn("k", lit(i))))
    // the earliest frames were evicted by the later tracks (cap 12);
    // a lazy consumer still gets the right answer via lineage recompute
    assert(dfs.head.count() == 100)
    assert(dfs.head.agg(sum("v")).head.getLong(0) == 4950L)
    assert(CachePool.liveCount <= 12)
  }
}
