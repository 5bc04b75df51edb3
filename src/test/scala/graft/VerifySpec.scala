package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle-SQL CTE-materialization rewrite Verify applies when
  * writing oracle_sql.json (r12): DuckDB's default CTE inlining
  * re-expands iterative oracle chains exponentially — the
  * checker-OOM-cascade root cause of the r10/r11 driver correctness
  * losses — so every CTE site gets AS MATERIALIZED, except queries
  * with a WINDOW clause whose definitions share the `name AS (` shape.
  */
class VerifySpec extends AnyFunSuite {

  test("CTE sites gain MATERIALIZED") {
    val sql = "WITH a AS (SELECT 1), b2 AS (SELECT * FROM a) SELECT * FROM b2"
    assert(Verify.materializeCtes(sql) ==
      "WITH a AS MATERIALIZED (SELECT 1), b2 AS MATERIALIZED (SELECT * FROM a) SELECT * FROM b2")
  }

  test("idempotent — already-materialized sites untouched") {
    val once = Verify.materializeCtes("WITH a AS (SELECT 1) SELECT * FROM a")
    assert(Verify.materializeCtes(once) == once)
  }

  test("WINDOW-clause queries pass through unchanged") {
    val sql = "WITH a AS (SELECT 1 AS x) SELECT sum(x) OVER w FROM a WINDOW w AS (ORDER BY x)"
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("non-CTE AS usages are untouched") {
    val sql = "SELECT CAST(x AS BIGINT) AS y, (SELECT 1) AS z FROM t"
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("every registered oracle stays parseable-shaped after rewrite") {
    // cheap structural pin: balanced parens preserved and the rewrite
    // never fires inside a WINDOW-clause query of the real suite
    for ((name, sql) <- SparkEntry.oracleSql) {
      val rw = Verify.materializeCtes(sql)
      assert(rw.count(_ == '(') == sql.count(_ == '('), name)
      assert(rw.count(_ == ')') == sql.count(_ == ')'), name)
      if (WindowRe.findFirstIn(sql).isDefined) assert(rw == sql, name)
    }
  }

  private val WindowRe = """(?i)\bWINDOW\s+\w+\s+AS\s*\(""".r
}
