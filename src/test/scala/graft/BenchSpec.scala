package graft

/** The bench must be failure-honest (round-2 verdict: wrong #2): a
  * throwing query may not masquerade as a fast timing — it must surface
  * in an `errors` object while the run still completes normally.
  */
class BenchSpec extends SparkSpec {

  test("broken sf dir yields error fields, not fake timings") {
    val json = Bench.run(spark, "/nonexistent/graft-sfdir",
      only = Some(Set("q1_agg", "q_dedup_exact")))
    assert(json.contains("\"errors\":{"), json)
    assert(json.contains("\"q1_agg\":\""), json)
    assert(json.contains("\"q_dedup_exact\":\""), json)
    // no timing entry for the failed queries
    assert(json.contains("\"queries\":{}"), json)
    assert(json.contains("\"value\":0.000"), json)
  }

  test("healthy subset run reports timings and no errors") {
    val json = Bench.run(spark, "/root/testdata/sf0.001", only = Some(Set("q1_agg")))
    assert(!json.contains("\"errors\""), json)
    assert(json.matches(""".*"queries":\{"q1_agg":[0-9.]+\}.*"""), json)
  }
}
