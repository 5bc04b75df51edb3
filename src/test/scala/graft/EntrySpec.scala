package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Driver-contract smoke: entry yields rows; every oracle has a query;
  * queries run at sf0.001 — and, suite-wide, NO query's executed plan
  * contains a single-partition global window (the 100 TB kill-switch:
  * an empty partitionSpec serializes the whole input through one
  * task). The RangeRank family exists precisely so every global
  * rank/prefix-sum has a bucketed shape; this pins that no headline
  * entry regressed to the spec shape.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no orphaned oracle SQL in the query objects") {
    // Round-11 regression class: qDupWeights/qDupWeightsSql were authored
    // in DedupQueries but never registered in SparkEntry, so they had no
    // correctness row. Reflectively collect every public zero-arg `q*Sql`
    // String member of the query objects and require its VALUE to appear
    // in a registered oracle (exact, or embedded — the recall/curve
    // oracles compose their base search SQL as a subquery, and derived
    // oracles like q_ivfpq_filtered rewrite anchored fragments of it).
    val objects: Seq[(String, AnyRef)] = Seq(
      "DedupQueries" -> graft.queries.DedupQueries,
      "EvalQueries" -> graft.queries.EvalQueries,
      "Events" -> graft.queries.Events,
      "PipelineQueries" -> graft.queries.PipelineQueries,
      "QualityQueries" -> graft.queries.QualityQueries,
      "Relational" -> graft.queries.Relational)
    val registered = SparkEntry.oracleSql.values.toSeq
    val orphans = for {
      (oname, obj) <- objects
      m <- obj.getClass.getMethods.toSeq
      if m.getName.matches("q.*Sql") && m.getParameterCount == 0 &&
        m.getReturnType == classOf[String]
      sql = m.invoke(obj).asInstanceOf[String]
      // registered directly, embedded in a composing oracle, or the
      // base text a derived oracle rewrites (share a 200-char prefix)
      if !registered.exists(r =>
        r.contains(sql) || r.take(200) == sql.take(200))
    } yield s"$oname.${m.getName}"
    assert(orphans.isEmpty,
      s"oracle SQL with no SparkEntry.oracleSql registration: $orphans")
  }

  test("all queries execute at sf0.001 with zero single-partition windows") {
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, name)
      // count() above ran the child plans, but the assertion must walk
      // the FINALIZED adaptive plan of the query itself — collect()
      // materializes it (cheap: sf0.001 results are tiny).
      df.collect()
      def windows(p: SparkPlan): Seq[SparkPlan] = {
        val here = p.collect {
          case w: WindowExec => w: SparkPlan
          case w: WindowGroupLimitExec => w: SparkPlan
        }
        val nested = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
          .flatMap(windows)
        here ++ nested
      }
      windows(df.queryExecution.executedPlan).foreach {
        case w: WindowExec =>
          assert(w.partitionSpec.nonEmpty,
            s"$name has a single-partition global Window:\n${w.nodeName}")
        case w: WindowGroupLimitExec =>
          assert(w.partitionSpec.nonEmpty,
            s"$name has a single-partition WindowGroupLimit:\n${w.nodeName}")
        case _ =>
      }
    }
  }
}
