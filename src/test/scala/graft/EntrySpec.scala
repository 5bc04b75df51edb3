package graft

/** Driver-contract smoke: entry yields rows; every oracle has a query;
  * queries run at sf0.001.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all queries execute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, dir).count()
      assert(n >= 0, name)
    }
  }
}
