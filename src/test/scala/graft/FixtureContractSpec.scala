package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-contract canaries (round-7, VERDICT r6 item #2).
  *
  * Round 6 proved the suite could stay green while 8 oracles were red:
  * the driver regenerated `events.parquet` with a different physical
  * timestamp type (ns → µs) and the loader's hard-coded ns workaround
  * silently compressed 30 days of data into 43 minutes — but `EntrySpec`
  * only asserts `count() >= 0`, which garbage values satisfy. These
  * canaries pin the *data contract* each loader must deliver, so
  * fixture-regeneration drift fails HERE, in-suite, not one round later
  * at the driver's DuckDB gate.
  */
class FixtureContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- events

  test("events.ts loads as a true timestamp type") {
    val df = SparkEntry.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must be TimestampType after load, got ${df.schema("ts").dataType}")
  }

  test("events span exceeds 1 day (ts not unit-compressed)") {
    // The div-1000 bug collapsed the 30-day fixture to 43 minutes; any
    // unit mix-up (ns read as µs, µs read as ms, …) shifts the span by
    // 1000× and fails this.
    val row = SparkEntry.events(spark, dir)
      .agg(
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("span_us"),
        year(min(col("ts"))).as("min_year"))
      .head()
    val spanUs = row.getLong(0)
    assert(spanUs > 86400L * 1000000L,
      s"events span is ${spanUs / 1e6} s — less than a day; ts unit is wrong")
    // A unit error also relocates the epoch (µs-as-ns → 1970). The
    // fixture generator stamps contemporary dates; a century-wide window
    // survives regeneration while still catching any 1000× shift.
    val minYear = row.getInt(1)
    assert(minYear >= 2000 && minYear <= 2100,
      s"events min(ts) year is $minYear — epoch relocated, ts unit is wrong")
  }

  test("events have multi-session users (gap structure intact)") {
    // With timestamps compressed 1000×, no inter-event gap ever exceeds
    // the 30-minute sessionization threshold → exactly one session per
    // user (r6: q_sessionize 150 vs 9549). Require that at least one
    // user has a >30min gap, i.e. sessionization is non-degenerate.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = SparkEntry.events(spark, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .where(col("prev").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000)
      .count()
    assert(gapped > 0, "no user has a >30min inter-event gap — ts unit is wrong")
  }

  test("events ts round-trips through unix_micros") {
    // unix_micros(ts) must land in the contemporary epoch range
    // (2020-01-01 .. 2100-01-01 in µs), not 1970-adjacent values.
    val us = SparkEntry.events(spark, dir).agg(min(unix_micros(col("ts")))).head().getLong(0)
    assert(us > 1577836800000000L && us < 4102444800000000L,
      s"min unix_micros(ts) = $us — outside the contemporary epoch window")
  }

  // ----------------------------------------------- physical-type drift

  /** Kind-level schema contracts for every fixture table: exact integer
    * widths may drift across regenerations (int32 ↔ int64 — Spark and
    * DuckDB both read either), but a column changing *kind* (integral →
    * string/float, timestamp → long) breaks query semantics and must
    * fail in-suite. See COVERAGE.md "fixture contracts".
    */
  private val kindContracts: Map[String, Map[String, DataType => Boolean]] = {
    val integral: DataType => Boolean =
      t => t == IntegerType || t == LongType || t == ShortType
    val floating: DataType => Boolean = t => t == DoubleType || t == FloatType
    val str: DataType => Boolean = _ == StringType
    val ts: DataType => Boolean = t => t == TimestampType || t == TimestampNTZType
    val floatArr: DataType => Boolean = {
      case ArrayType(el, _) => floating(el)
      case _                => false
    }
    Map(
      "region" -> Map("r_regionkey" -> integral, "r_name" -> str),
      "nation" -> Map("n_nationkey" -> integral, "n_name" -> str, "n_regionkey" -> integral),
      "customer" -> Map("c_custkey" -> integral, "c_nationkey" -> integral,
        "c_acctbal" -> floating, "c_mktsegment" -> str),
      "supplier" -> Map("s_suppkey" -> integral, "s_nationkey" -> integral, "s_acctbal" -> floating),
      "part" -> Map("p_partkey" -> integral, "p_size" -> integral, "p_retailprice" -> floating,
        "p_brand" -> str, "p_type" -> str),
      "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
        "o_totalprice" -> floating, "o_orderdate" -> ts, "o_orderpriority" -> str),
      "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
        "l_suppkey" -> integral, "l_linenumber" -> integral, "l_quantity" -> floating,
        "l_extendedprice" -> floating, "l_discount" -> floating, "l_tax" -> floating,
        "l_returnflag" -> str, "l_linestatus" -> str, "l_shipdate" -> ts),
      "documents" -> Map("doc_id" -> integral, "text" -> str, "lang" -> str,
        "source" -> str, "n_chars" -> integral),
      "embeddings" -> Map("vec_id" -> integral, "embedding" -> floatArr, "label" -> integral)
    )
  }

  test("every fixture table matches its kind-level schema contract") {
    for ((tbl, cols) <- kindContracts) {
      val schema = spark.read.parquet(s"$dir/$tbl.parquet").schema
      for ((name, ok) <- cols) {
        assert(schema.fieldNames.contains(name), s"$tbl missing column $name")
        val t = schema(name).dataType
        assert(ok(t), s"$tbl.$name has unexpected kind: $t")
      }
    }
  }

  // --------------------------------------------- ts magnitude bands

  test("unannotated INT64 ts outside both confidence bands fails loudly") {
    // r9 advice: the old open-ended `≥1e13 → µs` branch silently
    // misclassified a pre-1973 epoch-ns value as µs. The probe now
    // classifies only INSIDE a band — ns [1e17, Long.Max), µs
    // [1e13, 4e15] — and throws on the ambiguous gap.
    import spark.implicits._
    def writeTs(v: Long): String = {
      val p = java.nio.file.Files.createTempDirectory("tsband").toString + "/t"
      Seq(v).toDF("ts").write.parquet(p)
      p
    }
    // inside the bands: classified, no throw
    assert(SparkEntry.tsLayout(spark, writeTs(1700000000000000L)) ==  // 2023 in µs
      SparkEntry.TsLayout.MicrosLong)
    assert(SparkEntry.tsLayout(spark, writeTs(1700000000000000000L)) == // 2023 in ns
      SparkEntry.TsLayout.NanosLong)
    // the gap (4e15, 1e17): pre-1973 if ns, year>2096 if µs → loud failure
    val e = intercept[IllegalStateException] {
      SparkEntry.tsLayout(spark, writeTs(50000000000000000L)) // 5e16
    }
    assert(e.getMessage.contains("confidence band"), e.getMessage)
    // far below the µs band: also loud
    intercept[IllegalStateException] {
      SparkEntry.tsLayout(spark, writeTs(1000000000L)) // epoch-seconds magnitude
    }
  }

  test("orders/lineitem date columns span more than a day") {
    // Same unit-compression canary for the other timestamp-bearing
    // tables (they load via plain reads today; this pins that a future
    // workaround can't silently compress them either).
    for ((tbl, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val row = spark.read.parquet(s"$dir/$tbl.parquet")
        .agg(min(col(c)).cast(TimestampType).as("lo"), max(col(c)).cast(TimestampType).as("hi"))
        .selectExpr("unix_micros(hi) - unix_micros(lo) AS span_us", "year(lo) AS y")
        .head()
      assert(row.getLong(0) > 86400L * 1000000L, s"$tbl.$c span under a day")
      val y = row.getInt(1)
      assert(y >= 1990 && y <= 2100, s"$tbl.$c min year $y outside plausible window")
    }
  }
}
