package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** General relational surface (SURVEY §7.2 step 8): joins, windows, set
  * operations, sorts/limits, sessionization, event-time windows — all
  * pure Spark builtins; the engine's job is picking scale-correct plans
  * (broadcast the dims, map-side combine, single-shuffle windows).
  *
  * Oracle-parity: monetary aggregates go through DECIMAL casts (exact at
  * any scale factor, immune to fp ordering); every query orders by a
  * unique key.
  */
object Relational {
  private val dec = DecimalType(12, 2)

  def exactSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** TPC-H Q3-style: revenue of unshipped BUILDING orders, top 10.
    * customer is broadcast (small dim); lineitem↔orders shuffle on the
    * join key with AQE free to flip to broadcast at small SFs.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cust = graft.sources.Tables.parquet(s, s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(dec) *
        (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation for one region, suppliers
    * co-national with customers. All dims broadcast; the only big
    * shuffle is lineitem↔orders.
    */
  def q5Region(s: SparkSession, dir: String): DataFrame = {
    val region = graft.sources.Tables.parquet(s, s"$dir/region.parquet").filter(col("r_name") === "ASIA")
    val nation = graft.sources.Tables.parquet(s, s"$dir/nation.parquet")
    val cust = graft.sources.Tables.parquet(s, s"$dir/customer.parquet")
    val supp = graft.sources.Tables.parquet(s, s"$dir/supplier.parquet")
    val ord = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast(dec) *
        (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6-style single-row forecast: the pushdown showcase — the
    * filter and 3-column projection must reach the parquet scan.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
        .cast(DoubleType).as("revenue"))

  val q6ForecastSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Window functions: each customer's first 3 orders with a running
    * total. One shuffle on o_custkey serves both window specs.
    */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"),
        col("running_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice, running_total FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |  FROM orders
      |) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Set operations: wealthy-customer nations vs wealthy-supplier
    * nations — INTERSECT ∪ (EXCEPT) ≡ nations with wealthy customers.
    */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val a = graft.sources.Tables.parquet(s, s"$dir/customer.parquet")
      .filter(col("c_acctbal") > 5000).select(col("c_nationkey").as("nk")).distinct()
    val b = graft.sources.Tables.parquet(s, s"$dir/supplier.parquet")
      .filter(col("s_acctbal") > 5000).select(col("s_nationkey").as("nk")).distinct()
    a.intersect(b).withColumn("src", lit("both"))
      .unionByName(a.except(b).withColumn("src", lit("customer_only")))
      .orderBy(col("nk"))
  }

  val qSetOpsSql: String =
    """WITH a AS (SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000),
      |     b AS (SELECT DISTINCT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000)
      |SELECT nk, 'both' AS src FROM (SELECT nk FROM a INTERSECT SELECT nk FROM b)
      |UNION ALL
      |SELECT nk, 'customer_only' AS src FROM (SELECT nk FROM a EXCEPT SELECT nk FROM b)
      |ORDER BY nk""".stripMargin

  /** Grouping sets: ROLLUP over returnflag/linestatus with exact sums
    * and a distinct count — the subtotal/grand-total surface the
    * reference lacks and Spark provides natively (SURVEY §2.4 note).
    * NULL grouping keys order first on both sides (DuckDB defaults to
    * NULLS LAST — made explicit).
    */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Sort + limit: global top-k via TakeOrderedAndProject (no full
    * sort at scale).
    */
  def qSortLimit(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val qSortLimitSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  private val MeltCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** UNPIVOT (melt) — the dual of `q_pivot`'s widening: lineitem's four
    * measure columns rotate into (measure, val) rows, then aggregate
    * per (returnflag, measure). `Dataset.unpivot` is a zero-shuffle
    * per-row expansion (a constant ×4 Generate, no data-dependent
    * explode); the only exchange is the bounded-key aggregation.
    * DECIMAL-exact sums.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .select(col("l_returnflag") +: MeltCols.map(col): _*)
      .unpivot(Array(col("l_returnflag")), MeltCols.map(col).toArray,
        "measure", "val")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), exactSum(col("val")).as("sum_val"))
      .orderBy("l_returnflag", "measure")

  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** One-pass data profile of lineitem's numeric measures — the
    * DESCRIBE-style observability surface (row count, nulls, distinct,
    * min/max, exact sum per column) computed in a SINGLE aggregation
    * over one scan, then pivoted long. At 100 TB this is the profiling
    * job you run per ingest partition; every stat is a mergeable
    * aggregate.
    */
  def qDataProfile(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
    val aggs = ProfileCols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        count(lit(1)).as(s"${c}_rows"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType).as(s"${c}_sum"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val rows = ProfileCols.map { c =>
      wide.select(lit(c).as("column_name"),
        (col(s"${c}_rows") - col(s"${c}_n")).as("n_nulls"),
        col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_val"), col(s"${c}_max").as("max_val"),
        col(s"${c}_sum").as("sum_val"))
    }
    rows.reduce(_ unionByName _).orderBy("column_name")
  }

  val qDataProfileSql: String =
    ProfileCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  min($c) AS min_val, max($c) AS max_val,
         |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Pairwise Pearson correlation of the four lineitem measures,
    * computed on the EXACT lattice: all five moment sums are DECIMAL
    * (2-dp inputs — exact, order-independent), the final correlation is
    * one double expression over those exact sums, rounded to 6 dp. One
    * aggregation pass for all pairs (mergeable at any scale); never
    * uses float accumulation, so the result is engine-identical.
    */
  def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
    val d4 = DecimalType(38, 4)
    val pairs = ProfileCols.combinations(2).toSeq.map { case Seq(a, b) => (a, b) }
    val moments =
      Seq(count(lit(1)).cast(DoubleType).as("n")) ++
        ProfileCols.flatMap { c =>
          Seq(sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType).as(s"s_$c"),
            sum((col(c).cast(d4) * col(c).cast(d4)).cast(d4)).cast(DoubleType).as(s"ss_$c"))
        } ++
        pairs.map { case (a, b) =>
          sum((col(a).cast(d4) * col(b).cast(d4)).cast(d4)).cast(DoubleType).as(s"sp_${a}_$b")
        }
    val wide = li.agg(moments.head, moments.tail: _*)
    val rows = pairs.map { case (a, b) =>
      wide.select(lit(a).as("col_a"), lit(b).as("col_b"),
        round((col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
          sqrt((col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
               (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))), 6).as("corr"))
    }
    rows.reduce(_ unionByName _).orderBy("col_a", "col_b")
  }

  val qCorrMatrixSql: String =
    ProfileCols.combinations(2).toSeq.map { case Seq(a, b) =>
      val n = "CAST(count(*) AS DOUBLE)"
      def sm(c: String) = s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
      def ssm(c: String) =
        s"CAST(sum(CAST(CAST($c AS DECIMAL(38,4)) * CAST($c AS DECIMAL(38,4)) AS DECIMAL(38,4))) AS DOUBLE)"
      val sp =
        s"CAST(sum(CAST(CAST($a AS DECIMAL(38,4)) * CAST($b AS DECIMAL(38,4)) AS DECIMAL(38,4))) AS DOUBLE)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  round(($n * $sp - ${sm(a)} * ${sm(b)}) /
         |    sqrt(($n * ${ssm(a)} - ${sm(a)} * ${sm(a)}) *
         |         ($n * ${ssm(b)} - ${sm(b)} * ${sm(b)})), 6) AS corr
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")

  /** Per-group simple OLS on the exact-moment lattice (the
    * [[qCorrMatrix]] discipline): for each return flag, regress
    * extended price on quantity — slope, intercept, r² from five
    * DECIMAL-exact moment sums, each finished as ONE double
    * expression with identical association both engines and rounded
    * to 6 dp. The intercept consumes the UNROUNDED slope (both sides
    * compute it from the same raw expression), so no rounding
    * composes. One mergeable aggregation pass; at 100 TB this is a
    * map-side-combined groupBy and five sums — the minimum any
    * regression pays.
    */
  def qRegression(s: SparkSession, dir: String): DataFrame = {
    val d4 = DecimalType(38, 4)
    val (x, y) = (col("l_quantity"), col("l_extendedprice"))
    graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(x.cast(DecimalType(18, 2))).cast(DoubleType).as("sx"),
        sum(y.cast(DecimalType(18, 2))).cast(DoubleType).as("sy"),
        sum((x.cast(d4) * y.cast(d4)).cast(d4)).cast(DoubleType).as("sxy"),
        sum((x.cast(d4) * x.cast(d4)).cast(d4)).cast(DoubleType).as("sxx"),
        sum((y.cast(d4) * y.cast(d4)).cast(d4)).cast(DoubleType).as("syy"))
      .withColumn("slope_raw",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        round(col("slope_raw"), 6).as("slope"),
        round((col("sy") - col("slope_raw") * col("sx")) / col("n"), 6).as("intercept"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
      .orderBy("l_returnflag")
  }

  val qRegressionSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(38,4)) * CAST(l_extendedprice AS DECIMAL(38,4)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(38,4)) * CAST(l_quantity AS DECIMAL(38,4)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,4)) * CAST(l_extendedprice AS DECIMAL(38,4)) AS DECIMAL(38,4))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag
      |),
      |s AS (
      |  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_raw FROM m
      |)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  round(slope_raw, 6) AS slope,
      |  round((sy - slope_raw * sx) / n, 6) AS intercept,
      |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** Revenue-concentration Gini coefficient over per-customer spend —
    * the scalar inequality measure beside [[qAbcAnalysis]]'s Pareto
    * bands: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n with x ascending and i the
    * 1-based rank. Ranks come from a total order on (cents, custkey)
    * so ties can't split engines; Σx and Σ(i·x) accumulate as
    * DECIMAL(38,0) on the cents lattice (exact at any SF — i·x alone
    * would push int64 around SF100); the finish is one double
    * expression rounded to 6 dp. The global rank is the exact SPEC
    * shape (one ordered partition, same caveat as [[qNtile]]); the
    * 100 TB path replaces it with range-partitioned ranking off
    * sampled quantile boundaries, with this query as its oracle.
    */
  def qGini(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy(col("cents"), col("o_custkey"))
    val d0 = DecimalType(38, 0)
    rev.withColumn("rn", row_number().over(w))
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast(d0)).cast(d0).as("sx"),
        sum(col("rn").cast(d0) * col("cents").cast(d0)).cast(d0).as("six"))
      .select(col("n").as("n_customers"),
        col("sx").cast("long").as("total_cents"),
        round(lit(2.0) * col("six").cast(DoubleType) /
            (col("n").cast(DoubleType) * col("sx").cast(DoubleType)) -
          (col("n").cast(DoubleType) + lit(1.0)) / col("n").cast(DoubleType), 6)
          .as("gini"))
  }

  /** The 100 TB twin of [[qGini]]: the global (cents, custkey) rank
    * comes from [[graft.operators.RangeRank.withGlobalRank]]
    * (range-bucketed two-pass rank — per-bucket parallel windows +
    * broadcast offsets) instead of a single-partition
    * `Window.orderBy`. Ranks are EXACT for any sketch boundary choice,
    * so this shares [[qGiniSql]] verbatim as its oracle; the no-global-
    * window plan shape is pinned by RangeRankScaleSpec.
    */
  def qGiniDist(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("cents"))
    val d0 = DecimalType(38, 0)
    graft.operators.RangeRank
      .withGlobalRank(rev, col("cents"), Seq(col("o_custkey")), out = "rn")
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast(d0)).cast(d0).as("sx"),
        sum(col("rn").cast(d0) * col("cents").cast(d0)).cast(d0).as("six"))
      .select(col("n").as("n_customers"),
        col("sx").cast("long").as("total_cents"),
        round(lit(2.0) * col("six").cast(DoubleType) /
            (col("n").cast(DoubleType) * col("sx").cast(DoubleType)) -
          (col("n").cast(DoubleType) + lit(1.0)) / col("n").cast(DoubleType), 6)
          .as("gini"))
  }

  val qGiniSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey
      |),
      |r AS (
      |  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rn FROM rev
      |),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |         CAST(sum(CAST(rn AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS six
      |  FROM r
      |)
      |SELECT n AS n_customers, CAST(sx AS BIGINT) AS total_cents,
      |       round(2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
      |             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
      |FROM s""".stripMargin

  /** CUBE over returnflag/linestatus — every grouping-set combination
    * (the rollup query's superset: +the linestatus-only subtotals).
    * Same exact sums; NULL markers order first on both sides.
    */
  def qCube(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Customer spend quartiles via ntile(4): per-quartile population and
    * exact spend range/total. The global ntile is the exact SPEC shape
    * (one ordered partition); the 100 TB path replaces it with
    * approx-percentile boundaries + a broadcast bucket join — the spec
    * stays the correctness oracle for that rewrite. Spend re-sums
    * DECIMAL-exactly inside each quartile, so no double-ordering drift.
    */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val spend = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("spend"))
    val w = Window.orderBy(col("spend").desc, col("o_custkey"))
    spend.withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("spend")).as("spend_min"),
        max(col("spend")).as("spend_max"),
        sum(col("spend").cast(DecimalType(18, 2))).cast(DoubleType).as("spend_sum"))
      .orderBy(col("quartile"))
  }

  /** The 100 TB EXACT twin of [[qNtile]] (headline entry since r11):
    * the global rank comes from
    * [[graft.operators.RangeRank.withGlobalRank]] (range-bucketed
    * two-pass rank, per-bucket parallel windows only) and the ntile
    * bucket is recovered from (rank, n) with SQL ntile's exact
    * fill rule — n%k leading buckets of size n/k+1, the rest n/k —
    * so the result is bit-identical to the single-partition spec
    * shape and shares [[qNtileSql]] verbatim as its oracle.
    * [[spendQuartilesApprox]] remains the sketch-boundary variant for
    * when approximate quartiles are acceptable at lower cost.
    */
  def qNtileDist(s: SparkSession, dir: String): DataFrame = {
    val spend = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("spend"))
    val total = spend.agg(count(lit(1)).as("_n"))
    graft.operators.RangeRank
      .withGlobalRank(spend, col("spend"), Seq(col("o_custkey")),
        desc = true, out = "_rn")
      .crossJoin(broadcast(total))
      // SQL ntile(k): r = n%k buckets of size q+1 first, then size q
      .withColumn("quartile", expr(
        "CASE WHEN _rn <= (_n % 4) * (_n div 4 + 1) " +
          "THEN (_rn - 1) div (_n div 4 + 1) + 1 " +
          "ELSE (_n % 4) + (_rn - 1 - (_n % 4) * (_n div 4 + 1)) div (_n div 4) + 1 END")
        .cast("long"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("spend")).as("spend_min"),
        max(col("spend")).as("spend_max"),
        sum(col("spend").cast(DecimalType(18, 2))).cast(DoubleType).as("spend_sum"))
      .orderBy(col("quartile"))
  }

  /** The 100 TB rewrite of [[qNtile]]: quartile boundaries from a
    * one-pass mergeable `approx_percentile` sketch, broadcast to a
    * map-only bucket assignment — no single-partition global window
    * anywhere. [[qNtile]] is the correctness oracle for this rewrite
    * (QuartileScaleSpec pins the agreement).
    */
  def spendQuartilesApprox(s: SparkSession, dir: String): DataFrame = {
    val spend = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("spend"))
    val bounds = spend.agg(percentile_approx(col("spend"),
      array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("bs"))
    spend.crossJoin(broadcast(bounds))
      .withColumn("quartile",
        when(col("spend") > col("bs")(2), 1L)
          .when(col("spend") > col("bs")(1), 2L)
          .when(col("spend") > col("bs")(0), 3L)
          .otherwise(4L))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("spend")).as("spend_min"),
        max(col("spend")).as("spend_max"))
      .orderBy(col("quartile"))
  }

  val qNtileSql: String =
    """SELECT quartile, count(*) AS n_customers,
      |       min(spend) AS spend_min, max(spend) AS spend_max,
      |       CAST(sum(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS spend_sum
      |FROM (
      |  SELECT o_custkey, spend,
      |         CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS quartile
      |  FROM (
      |    SELECT o_custkey,
      |           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |    FROM orders GROUP BY o_custkey
      |  )
      |)
      |GROUP BY quartile ORDER BY quartile""".stripMargin

  private def rel(dir: String, t: String): String = s"parquet.`$dir/$t.parquet`"

  /** TPC-H Q17-shape: per-brand revenue from "small lots" — lineitems
    * whose quantity is below 20% of that part's average quantity. The
    * threshold is a CORRELATED SCALAR AGGREGATE SUBQUERY per outer row;
    * Catalyst decorrelates it into one aggregate over lineitem joined
    * back on l_partkey (no per-row re-execution), and its
    * MergeScalarSubqueries rule fuses the count/sum pair into a single
    * aggregate scan. The `qty < 0.2*avg` predicate is restated as
    * integer-exact `5*qty*count < sum` so no float threshold can flip a
    * borderline row between engines.
    */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT p_brand,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_lot_revenue,
         |  count(*) AS n_small
         |FROM ${rel(dir, "lineitem")} l JOIN ${rel(dir, "part")} p ON p_partkey = l_partkey
         |WHERE CAST(floor(l_quantity) AS BIGINT) * 5 *
         |      (SELECT count(*) FROM ${rel(dir, "lineitem")} l2 WHERE l2.l_partkey = l.l_partkey)
         |    < (SELECT sum(CAST(floor(l_quantity) AS BIGINT)) FROM ${rel(dir, "lineitem")} l3 WHERE l3.l_partkey = l.l_partkey)
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin)

  val qScalarSubquerySql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_lot_revenue,
      |  count(*) AS n_small
      |FROM lineitem l JOIN part p ON p_partkey = l_partkey
      |WHERE CAST(floor(l_quantity) AS BIGINT) * 5 *
      |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |    < (SELECT sum(CAST(floor(l_quantity) AS BIGINT)) FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q21-shape: suppliers who were the ONLY late shipper on a
    * finished multi-supplier order ("late" = shipped >60 days after the
    * order date). Correlated EXISTS (another supplier on the order) and
    * NOT EXISTS (no OTHER supplier late — note the correlation reaches
    * the outer o_orderdate, a non-equi correlated predicate) both
    * decorrelate to semi/anti joins on l_orderkey.
    */
  def qExistsJoin(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT s_name, count(*) AS numwait
         |FROM ${rel(dir, "lineitem")} l1
         |JOIN ${rel(dir, "orders")} ON o_orderkey = l1.l_orderkey
         |JOIN ${rel(dir, "supplier")} ON s_suppkey = l1.l_suppkey
         |WHERE o_orderstatus = 'F'
         |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         |  AND EXISTS (SELECT 1 FROM ${rel(dir, "lineitem")} l2
         |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM ${rel(dir, "lineitem")} l3
         |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
         |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin)

  val qExistsJoinSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** LATERAL correlated subquery with LIMIT (the top-N-per-key shape
    * as a join operator): each high-balance customer paired with its 2
    * most expensive orders. Catalyst decorrelates the per-row LIMIT
    * into a window rank below an equi-join — the same plan the
    * hand-written WindowGroupLimit form gets, with the subquery syntax.
    */
  def qLateral(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         |FROM ${rel(dir, "customer")} c,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM ${rel(dir, "orders")}
         |  WHERE o_custkey = c.c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         |WHERE c.c_acctbal > 9000
         |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)

  val qLateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_acctbal > 9000
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** HAVING against scalar subqueries: customers placing more orders
    * than the corpus-wide average orders-per-customer (restated
    * integer-exactly as count*ncust > total). The two uncorrelated
    * scalar subqueries execute once each (subquery reuse), not per
    * group.
    */
  def qHavingSubquery(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT o_custkey, count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
         |FROM ${rel(dir, "orders")}
         |GROUP BY o_custkey
         |HAVING count(*) * (SELECT count(DISTINCT o_custkey) FROM ${rel(dir, "orders")})
         |     > (SELECT count(*) FROM ${rel(dir, "orders")})
         |ORDER BY o_custkey""".stripMargin)

  val qHavingSubquerySql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) * (SELECT count(DISTINCT o_custkey) FROM orders)
      |     > (SELECT count(*) FROM orders)
      |ORDER BY o_custkey""".stripMargin

  val qUnpivotSql: String = {
    val arms = MeltCols.map(c =>
      s"SELECT l_returnflag, '$c' AS measure, $c AS val FROM lineitem")
      .mkString("\n      |  UNION ALL ")
    s"""SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
       |       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
       |FROM (
       |  $arms
       |)
       |GROUP BY l_returnflag, measure
       |ORDER BY l_returnflag, measure""".stripMargin
  }

  /** Per-brand Pareto frontier over parts (minimize retail price AND
    * size): the skyline operator ([[graft.operators.Skyline]] — agg to
    * distinct prices, running-min window on the shrunk frame, broadcast
    * semi-join back), checked against the DEFINITIONAL per-pair
    * NOT-EXISTS dominance oracle — structurally different evaluation
    * orders, identical frontier.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skyline.skyline2dMin(
        graft.sources.Tables.parquet(s, s"$dir/part.parquet")
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size")),
        groupCol = "p_brand", xCol = "p_retailprice", yCol = "p_size")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_brand"), col("p_retailprice"), col("p_partkey"))

  val qSkylineSql: String =
    """SELECT p_partkey, p_brand, p_retailprice, p_size
      |FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_brand = a.p_brand
      |    AND b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
      |)
      |ORDER BY p_brand, p_retailprice, p_partkey""".stripMargin

  /** The full ranking-function family in one pass: rank, dense_rank,
    * percent_rank, cume_dist over customer spend within market segment.
    * All four are value-based (ties share a rank), so the result is
    * deterministic without a tie-break; percent_rank/cume_dist are
    * single divisions of exact small integers — correctly rounded,
    * engine-identical doubles.
    *
    * Scale shape: the orders aggregation shrinks input to |customers|
    * BEFORE the window; the window partitions by segment (the same
    * coarse-partition caveat as `q_ntile` — its approx-percentile
    * rewrite is the 100 TB path when segments are few and huge).
    */
  def qRankFamily(s: SparkSession, dir: String): DataFrame = {
    val spend = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(exactSum(col("o_totalprice")).as("spend"))
    val cust = graft.sources.Tables.parquet(s, s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("spend").desc)
    spend.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("spend"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("c_mktsegment"), col("o_custkey"))
  }

  val qRankFamilySql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT c.c_mktsegment, s.o_custkey, s.spend,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |       percent_rank() OVER w AS prank,
      |       cume_dist() OVER w AS cdist
      |FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC)
      |ORDER BY c_mktsegment, o_custkey""".stripMargin

  /** Exact PERCENTILE_CONT (linear interpolation) per group, computed
    * on the cents lattice so the interpolation is pure integer
    * arithmetic: pos = (n−1)·k/4 for quartiles k=1..3 splits into
    * idx = ⌊·⌋ and rem ∈ {0..3}; the interpolated value ×4 is
    * lo·(4−rem) + hi·rem — an exact BIGINT both engines compute
    * identically (the final /400 to currency units is one correctly-
    * rounded double division). Neither engine's builtin
    * percentile_cont is trusted across engines; both sides run THIS
    * definition.
    *
    * Scale shape: one rank window per group (same spec-vs-approx
    * contract as `q_ntile` — `spendQuartilesApprox` is the documented
    * 100 TB rewrite); the quartile selection joins pick 2 rows per
    * (group, k).
    */
  def qPercentileCont(s: SparkSession, dir: String): DataFrame = {
    val v = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val r = v.withColumn("rn",
      row_number().over(Window.partitionBy(col("grp")).orderBy(col("c"))).cast("long"))
    val n = v.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val pos = n.crossJoin(s.range(1, 4).select(col("id").as("k")))
      .withColumn("idx", expr("(n - 1) * k div 4"))
      .withColumn("rem", expr("(n - 1) * k % 4"))
    pos.as("p")
      .join(r.as("lo"), col("p.grp") === col("lo.grp") && col("lo.rn") === col("p.idx") + 1)
      .join(r.as("hi"), col("p.grp") === col("hi.grp") &&
        col("hi.rn") === least(col("p.idx") + 2, col("p.n")))
      .select(col("p.grp").as("grp"), col("p.k").as("k"), col("p.n").as("n"),
        (col("lo.c") * (lit(4) - col("p.rem")) + col("hi.c") * col("p.rem")).as("pcont_x4"))
      .withColumn("pcont", col("pcont_x4").cast("double") / lit(400.0))
      .orderBy(col("grp"), col("k"))
  }

  val qPercentileContSql: String =
    """WITH v AS (SELECT o_orderpriority AS grp,
      |                  CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      |r AS (SELECT grp, c,
      |             CAST(row_number() OVER (PARTITION BY grp ORDER BY c) AS BIGINT) AS rn
      |      FROM v),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY grp),
      |pos AS (SELECT grp, n, k, (n - 1) * k // 4 AS idx, (n - 1) * k % 4 AS rem
      |        FROM n CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
      |sel AS (
      |  SELECT p.grp, CAST(p.k AS BIGINT) AS k, p.n,
      |         lo.c * (4 - p.rem) + hi.c * p.rem AS pcont_x4
      |  FROM pos p
      |  JOIN r lo ON lo.grp = p.grp AND lo.rn = p.idx + 1
      |  JOIN r hi ON hi.grp = p.grp AND hi.rn = least(p.idx + 2, p.n)
      |)
      |SELECT grp, k, n, pcont_x4,
      |       CAST(pcont_x4 AS DOUBLE) / 400.0 AS pcont
      |FROM sel ORDER BY grp, k""".stripMargin

  /** Three-valued-logic parity in one query: NULLIF-generated nulls,
    * count(*) vs count(col), nulls as their own GROUP BY key, COALESCE
    * presentation, and a NULL-SAFE self-join (Spark `<=>` ≡ SQL
    * `IS NOT DISTINCT FROM`) proving the null group matches itself
    * exactly once while ordinary equality would drop it.
    */
  def qNullSemantics(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .select(nullif(col("l_returnflag"), lit("N")).as("rf"),
        col("l_quantity"))
    val g = li.groupBy(col("rf"))
      .agg(count(lit(1)).as("n_rows"), count(col("rf")).as("n_nonnull"),
        exactSum(col("l_quantity")).as("sum_qty"))
    g.as("a").join(g.as("b"), col("a.rf") <=> col("b.rf"))
      .select(coalesce(col("a.rf"), lit("<null>")).as("rf_filled"),
        col("a.n_rows").as("n_rows"), col("a.n_nonnull").as("n_nonnull"),
        col("a.sum_qty").as("sum_qty"),
        col("b.n_rows").as("n_rows_selfmatch"))
      .orderBy(col("rf_filled"))
  }

  val qNullSemanticsSql: String =
    """WITH li AS (SELECT NULLIF(l_returnflag, 'N') AS rf, l_quantity FROM lineitem),
      |g AS (
      |  SELECT rf, count(*) AS n_rows, count(rf) AS n_nonnull,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |  FROM li GROUP BY rf
      |)
      |SELECT COALESCE(a.rf, '<null>') AS rf_filled,
      |       a.n_rows, a.n_nonnull, a.sum_qty,
      |       b.n_rows AS n_rows_selfmatch
      |FROM g a JOIN g b ON a.rf IS NOT DISTINCT FROM b.rf
      |ORDER BY rf_filled""".stripMargin

  /** Calendar rollup: orders per (year, month) with quarter, exact
    * spend, and day-of-month extremes — the datetime-extraction family
    * on definitions both engines share (year/month/quarter/day).
    * ISO day-of-week is covered by [[qDowProfile]] with an explicit
    * normalization (the raw builtins disagree on week start across
    * engines — Spark counts from Sunday=1, DuckDB from Sunday=0).
    */
  def qDatetimeRollup(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("mo"),
        quarter(col("o_orderdate")).cast("long").as("q"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("spend"),
        min(dayofmonth(col("o_orderdate"))).cast("long").as("first_dom"),
        max(dayofmonth(col("o_orderdate"))).cast("long").as("last_dom"))
      .orderBy(col("y"), col("mo"))

  val qDatetimeRollupSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |       CAST(min(day(o_orderdate)) AS BIGINT) AS first_dom,
      |       CAST(max(day(o_orderdate)) AS BIGINT) AS last_dom
      |FROM orders GROUP BY 1, 2, 3 ORDER BY y, mo""".stripMargin

  /** ISO day-of-week profile (1=Monday … 7=Sunday): Spark's
    * `dayofweek` (Sunday=1) is normalized as ((dow+5) mod 7)+1; the
    * oracle uses DuckDB's native `isodow` — two different engine
    * definitions mapped onto ONE documented calendar contract.
    */
  def qDowProfile(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy((((dayofweek(col("o_orderdate")) + 5) % 7) + 1).cast("long").as("iso_dow"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("spend"))
      .orderBy(col("iso_dow"))

  val qDowProfileSql: String =
    """SELECT CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY 1 ORDER BY iso_dow""".stripMargin

  /** Non-regex string-function family on shared semantics: length,
    * case mapping, replace, substring, lpad, reverse, split-part,
    * 1-based substring position (0 = absent) — each chosen because the
    * two engines define it identically on ASCII (regex functions are
    * deliberately excluded: Java and RE2 regex dialects differ).
    * Map-only projection; hash-exact output pins the whole family.
    */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/part.parquet")
      .select(col("p_partkey"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_name")).as("name_upper"),
        replace(col("p_name"), lit(" "), lit("_")).as("name_snake"),
        substring(col("p_name"), 1, 5).as("name_head"),
        lpad(col("p_brand"), 12, ".").as("brand_padded"),
        reverse(col("p_type")).as("type_rev"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        instr(col("p_name"), "al").cast("long").as("al_pos"))
      .orderBy(col("p_partkey"))

  val qStringFuncsSql: String =
    """SELECT p_partkey,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       upper(p_name) AS name_upper,
      |       replace(p_name, ' ', '_') AS name_snake,
      |       substring(p_name, 1, 5) AS name_head,
      |       lpad(p_brand, 12, '.') AS brand_padded,
      |       reverse(p_type) AS type_rev,
      |       string_split(p_name, ' ')[1] AS first_word,
      |       CAST(strpos(p_name, 'al') AS BIGINT) AS al_pos
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Conditional/boolean aggregate family: filtered counts as
    * sum(CASE), bool_and / bool_or (as 0/1 ints — booleans hash
    * differently across drivers), and a conditional average on the
    * exact DECIMAL lattice.
    */
  def qConditionalAgg(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_big"),
        expr("CAST(bool_and(l_quantity <= 50) AS INT)").cast("long").as("all_in_range"),
        expr("CAST(bool_or(l_discount > 0.09) AS INT)").cast("long").as("any_deep_discount"),
        sum(when(col("l_quantity") > 25, col("l_extendedprice").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType).as("big_revenue"))
      .orderBy(col("l_returnflag"))

  val qConditionalAggSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |       CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |       CAST(CAST(bool_and(l_quantity <= 50) AS INT) AS BIGINT) AS all_in_range,
      |       CAST(CAST(bool_or(l_discount > 0.09) AS INT) AS BIGINT) AS any_deep_discount,
      |       CAST(sum(CASE WHEN l_quantity > 25
      |                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_revenue
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Array/higher-order function family over the tokenized part name —
    * size, sort, distinct, slice, membership, position, negative
    * indexing, flatten — each picked because the two engines define it
    * identically (Spark array_sort ≡ DuckDB list_sort on ASCII strings;
    * array_position ≡ COALESCE(list_position, 0)). Every array-valued
    * result is serialized through array_join so the comparison is over
    * plain strings, not driver-dependent nested encodings; DuckDB's
    * list_distinct has unspecified order, so distinct always sorts.
    * Map-only projection — no shuffle at any scale.
    */
  def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/part.parquet")
      .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
      .select(col("p_partkey"),
        size(col("words")).cast("long").as("n_words"),
        array_join(array_sort(col("words")), "|").as("sorted_words"),
        array_join(array_sort(array_distinct(col("words"))), "|").as("distinct_words"),
        array_join(slice(col("words"), 2, 2), "|").as("mid_slice"),
        array_contains(col("words"), "red").cast("int").cast("long").as("has_red"),
        array_position(col("words"), "red").as("red_pos"),
        element_at(col("words"), -1).as("last_word"),
        array_join(flatten(array(col("words"), col("words"))), "|").as("doubled"))
      .orderBy(col("p_partkey"))

  val qArrayFuncsSql: String =
    """SELECT p_partkey,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
      |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
      |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|')
      |    AS distinct_words,
      |  array_to_string(string_split(p_name, ' ')[2:3], '|') AS mid_slice,
      |  CAST(CAST(list_contains(string_split(p_name, ' '), 'red') AS INT) AS BIGINT)
      |    AS has_red,
      |  CAST(COALESCE(list_position(string_split(p_name, ' '), 'red'), 0) AS BIGINT)
      |    AS red_pos,
      |  string_split(p_name, ' ')[-1] AS last_word,
      |  array_to_string(flatten([string_split(p_name, ' '), string_split(p_name, ' ')]), '|')
      |    AS doubled
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Explicit GROUPING SETS (the general form under [[qRollup]]/
    * [[qCube]]): both one-dimension margins, the full cross, and the
    * grand total in one pass, with `grouping()` flags distinguishing a
    * real NULL-free key from an aggregated-away one. Keys are coalesced
    * to 'ALL' so the output never relies on NULL ordering.
    *
    * Scale shape: Catalyst expands the sets into one Expand + a single
    * shuffle keyed by (keys, grouping id) — same cost as a union of
    * four aggregations but one pass over orders.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS prio,
         |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
         |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
         |  count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM ${rel(dir, "orders")}
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
         |                        (o_orderstatus, o_orderpriority), ())
         |ORDER BY g_status, g_prio, status, prio""".stripMargin)

  val qGroupingSetsSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |                        (o_orderstatus, o_orderpriority), ())
      |ORDER BY g_status, g_prio, status, prio""".stripMargin

  /** FULL OUTER join parity: per-nation counts of high-balance
    * customers vs high-balance suppliers, keys coalesced across the
    * two sides and absent sides surfaced as explicit zeros + presence
    * flags — the reconciliation shape (two independently-aggregated
    * ledgers merged without losing either side's orphans).
    *
    * Scale shape: both sides aggregate BEFORE the join (|nations|-sized
    * inputs), so the full outer join is over bounded keys — never a
    * row-level full-outer of the raw tables.
    */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = graft.sources.Tables.parquet(s, s"$dir/customer.parquet")
      .filter(col("c_acctbal") > 7500)
      .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
    val p = graft.sources.Tables.parquet(s, s"$dir/supplier.parquet")
      .filter(col("s_acctbal") > 7500)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    c.join(p, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        (col("ck").isNotNull && col("sk").isNotNull).cast("int").cast("long")
          .as("both_sides"))
      .orderBy(col("nationkey"))
  }

  val qFullOuterSql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer
      |  WHERE c_acctbal > 7500 GROUP BY 1),
      |p AS (
      |  SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier
      |  WHERE s_acctbal > 7500 GROUP BY 1)
      |SELECT coalesce(ck, sk) AS nationkey,
      |       coalesce(n_cust, 0) AS n_cust,
      |       coalesce(n_supp, 0) AS n_supp,
      |       CAST(CAST(ck IS NOT NULL AND sk IS NOT NULL AS INT) AS BIGINT)
      |         AS both_sides
      |FROM c FULL OUTER JOIN p ON ck = sk
      |ORDER BY nationkey""".stripMargin

  /** ABC / Pareto analysis of customer revenue: customers ranked by
    * exact-cents revenue (ties to the lower key), classed by CUMULATIVE
    * revenue share on the integer-ppm lattice (A ≤ 80%, B ≤ 95%, else
    * C — thresholds compare exact integers, so class boundaries cannot
    * drift between engines). Output is the 3-row class summary.
    *
    * Scale shape: the global rank runs over PER-CUSTOMER AGGREGATES
    * (|customers| rows after one map-side-combined shuffle), not raw
    * orders — the single-partition sort is over the bounded aggregate,
    * the standard shape for a global Pareto curve. cum·10⁶ stays in
    * 64 bits while total revenue < ~9·10¹² cents; lift the lattice to
    * DECIMAL(38,0) beyond that.
    */
  def qAbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val total = rev.agg(sum(col("cents")).as("total_cents"))
    val w = Window.orderBy(col("cents").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_cents", sum(col("cents")).over(w))
      .crossJoin(broadcast(total))
      .withColumn("abc_class",
        // DECIMAL(38,0) lattice for the share: cum·10⁶ leaves int64 once
        // total revenue passes ~9·10¹² cents (hit at sf1 — ~3.8·10¹³), the
        // same exact-arithmetic widening qGini uses
        when(expr("CAST(cum_cents AS DECIMAL(38,0)) * 1000000 div total_cents") <= 800000, "A")
          .when(expr("CAST(cum_cents AS DECIMAL(38,0)) * 1000000 div total_cents") <= 950000, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("class_revenue_cents"),
        max(col("total_cents")).as("total_cents"))
      .select(col("abc_class"), col("n_customers"), col("class_revenue_cents"),
        expr("CAST(CAST(class_revenue_cents AS DECIMAL(38,0)) * 1000000 div total_cents AS BIGINT)")
          .as("revenue_share_ppm"))
      .orderBy(col("abc_class"))
  }

  /** The 100 TB twin of [[qAbcAnalysis]]: the global descending
    * cumulative-revenue sweep runs through
    * [[graft.operators.RangeRank.withRunningSum]] (range-bucketed
    * prefix sum — per-bucket parallel windows + broadcast bucket
    * offsets) instead of a single-partition window. The ROWS frame and
    * (cents desc, custkey) total order are identical, custkey makes the
    * order tie-free, and bucket offsets are exact long sums — so the
    * cum_cents column (and everything downstream) is bit-identical to
    * the spec, sharing [[qAbcAnalysisSql]] verbatim as its oracle.
    */
  def qAbcDist(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.sources.Tables.parquet(s, s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val total = rev.agg(sum(col("cents")).as("total_cents"))
    graft.operators.RangeRank
      .withRunningSum(rev, col("cents"), col("cents"), Seq(col("o_custkey")),
        desc = true, rowsFrame = true, out = "cum_cents")
      .crossJoin(broadcast(total))
      .withColumn("abc_class",
        // DECIMAL(38,0) lattice for the share: cum·10⁶ leaves int64 once
        // total revenue passes ~9·10¹² cents (hit at sf1 — ~3.8·10¹³), the
        // same exact-arithmetic widening qGini uses
        when(expr("CAST(cum_cents AS DECIMAL(38,0)) * 1000000 div total_cents") <= 800000, "A")
          .when(expr("CAST(cum_cents AS DECIMAL(38,0)) * 1000000 div total_cents") <= 950000, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("class_revenue_cents"),
        max(col("total_cents")).as("total_cents"))
      .select(col("abc_class"), col("n_customers"), col("class_revenue_cents"),
        expr("CAST(CAST(class_revenue_cents AS DECIMAL(38,0)) * 1000000 div total_cents AS BIGINT)")
          .as("revenue_share_ppm"))
      .orderBy(col("abc_class"))
  }

  val qAbcAnalysisSql: String =
    """WITH rev AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM rev),
      |ranked AS (
      |  SELECT cents,
      |         CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |           AS cum_cents
      |  FROM rev),
      |classed AS (
      |  SELECT cents,
      |         CASE WHEN CAST(cum_cents AS HUGEINT) * 1000000 // total_cents <= 800000 THEN 'A'
      |              WHEN CAST(cum_cents AS HUGEINT) * 1000000 // total_cents <= 950000 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |         total_cents
      |  FROM ranked, tot)
      |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(cents) AS BIGINT) AS class_revenue_cents,
      |       CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // any_value(total_cents)
      |            AS BIGINT) AS revenue_share_ppm
      |FROM classed GROUP BY 1
      |ORDER BY abc_class""".stripMargin

  /** Mode / argmax aggregate family: per return flag, the modal
    * quantity (most frequent; ties to the SMALLEST value — neither
    * engine's builtin mode() pins tie order, so both run this explicit
    * count+rank definition), its frequency, and the argmax lineitem
    * (the extendedprice-richest row's orderkey, ties to the smaller
    * key) — the "which value / which row" aggregates GROUP BY alone
    * can't express.
    *
    * Scale shape: mode = one (flag, qty)-keyed map-side-combined count
    * + a rank over |flags|×|distinct qty| rows; argmax = one
    * flag-partitioned WindowGroupLimit (rank pushed below the
    * shuffle). No row-level sort anywhere.
    */
  def qModeArgmax(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
    // explicit floor pins ONE semantics: a bare DOUBLE→BIGINT cast
    // truncates in Spark but rounds in DuckDB
    val qty = floor(col("l_quantity")).cast("long")
    val modes = li.groupBy(col("l_returnflag"), qty.as("qv"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("freq").desc, col("qv"))))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("qv").as("mode_qty"), col("freq").as("mode_freq"))
    val argmax = li
      .select(col("l_returnflag"), col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("price_cents").desc, col("l_orderkey"))))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_orderkey").as("richest_orderkey"),
        col("price_cents").as("max_price_cents"))
    modes.join(argmax, "l_returnflag").orderBy(col("l_returnflag"))
  }

  val qModeArgmaxSql: String =
    """WITH modes AS (
      |  SELECT l_returnflag, qv AS mode_qty, freq AS mode_freq FROM (
      |    SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS qv,
      |           count(*) AS freq,
      |           row_number() OVER (PARTITION BY l_returnflag
      |                              ORDER BY count(*) DESC, CAST(floor(l_quantity) AS BIGINT))
      |             AS rn
      |    FROM lineitem GROUP BY 1, 2)
      |  WHERE rn = 1),
      |argmax AS (
      |  SELECT l_returnflag, l_orderkey AS richest_orderkey,
      |         price_cents AS max_price_cents FROM (
      |    SELECT l_returnflag, l_orderkey,
      |           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
      |           row_number() OVER (PARTITION BY l_returnflag
      |                              ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
      |                                       l_orderkey) AS rn
      |    FROM lineitem)
      |  WHERE rn = 1)
      |SELECT l_returnflag, mode_qty, mode_freq, richest_orderkey, max_price_cents
      |FROM modes JOIN argmax USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  private val HistBuckets = 20

  /** Equi-width histogram of `l_extendedprice` in 20 buckets with
    * zero-filled empty buckets — the profiling companion to
    * `q_data_profile`. All bucketing runs on the exact CENTS lattice
    * (price × 100 as BIGINT) with integer division, so bucket edges and
    * assignments are engine-identical; the bucket spine is generated,
    * making empty buckets explicit rows.
    *
    * Scale shape: one min/max aggregation broadcast into a map-only
    * bucket-assign pass, then a combine-style count shuffle bounded by
    * the bucket count; the spine join is a broadcast of 20 rows.
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("long").as("xc"))
    val stats = li.agg(min(col("xc")).as("minc"), max(col("xc")).as("maxc"))
    val counts = li.crossJoin(broadcast(stats))
      .select(least(lit(HistBuckets - 1),
        expr(s"(xc - minc) * $HistBuckets div (maxc - minc)")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    s.range(HistBuckets).select(col("id").as("bucket"))
      .crossJoin(broadcast(stats))
      .select(col("bucket"),
        expr(s"minc + (maxc - minc) * bucket div $HistBuckets").as("lo_cents"),
        expr(s"minc + (maxc - minc) * (bucket + 1) div $HistBuckets").as("hi_cents"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), col("lo_cents"), col("hi_cents"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(col("bucket"))
  }

  val qHistogramSql: String =
    s"""WITH x AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc FROM lineitem),
       |st AS (SELECT min(xc) AS minc, max(xc) AS maxc FROM x),
       |counts AS (
       |  SELECT least($HistBuckets - 1, (xc - minc) * $HistBuckets // (maxc - minc)) AS bucket,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM x CROSS JOIN st
       |  GROUP BY 1
       |),
       |spine AS (SELECT unnest(generate_series(0, $HistBuckets - 1)) AS bucket)
       |SELECT s.bucket,
       |       minc + (maxc - minc) * s.bucket // $HistBuckets AS lo_cents,
       |       minc + (maxc - minc) * (s.bucket + 1) // $HistBuckets AS hi_cents,
       |       COALESCE(cnt, 0) AS cnt
       |FROM spine s CROSS JOIN st LEFT JOIN counts c ON c.bucket = s.bucket
       |ORDER BY s.bucket""".stripMargin

  private val MinPairSupport = 5L

  /** Market-basket association rules at the brand level: each order is
    * a basket of the distinct part brands it contains; every brand
    * pair co-occurring in ≥ [[MinPairSupport]] baskets gets exact
    * integer-ppm support, both confidence directions and lift. The
    * whole lattice is BIGINT floor division — no doubles anywhere, so
    * engine-identical at any SF. Plan shape at 100 TB: brand rides in
    * on a broadcast dim join; the pair generation is a self
    * hash-equi-join co-partitioned on the order key whose per-order
    * output is C(brands-in-order, 2) — bounded by basket width, never
    * by catalog size; brand-pair counts map-side combine into at most
    * |brands|² rows; the count/total frames joined back are broadcast.
    */
  /** Pair co-occurrence counts from a (l_orderkey, p_brand) basket
    * frame — MERGEABLE: counts are plain sums, so per-batch counts
    * from an ORDER-ATOMIC stream (a micro-batch carries whole orders,
    * the natural ingest unit) union+sum into exactly the full-corpus
    * counts (StreamingSpec proves it).
    */
  def basketPairCounts(baskets: DataFrame): DataFrame =
    baskets.as("x")
      .join(baskets.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") && col("x.p_brand") < col("y.p_brand"))
      .groupBy(col("x.p_brand").as("brand_a"), col("y.p_brand").as("brand_b"))
      .agg(count(lit(1)).as("pair_count"))

  /** Per-brand basket counts (same mergeable contract). */
  def basketItemCounts(baskets: DataFrame): DataFrame =
    baskets.groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))

  /** One-row basket total (same mergeable contract). */
  def basketTotals(baskets: DataFrame): DataFrame =
    baskets.agg(countDistinct(col("l_orderkey")).as("n_orders"))

  /** The rule lattice from the three count frames — shared by the
    * batch query and the streaming-merge twin.
    */
  def basketRulesFromCounts(pairCounts: DataFrame, itemCounts: DataFrame,
                            totals: DataFrame): DataFrame =
    pairCounts
      .filter(col("pair_count") >= MinPairSupport)
      .join(broadcast(itemCounts.select(col("p_brand").as("brand_a"),
        col("cnt").as("count_a"))), "brand_a")
      .join(broadcast(itemCounts.select(col("p_brand").as("brand_b"),
        col("cnt").as("count_b"))), "brand_b")
      .crossJoin(broadcast(totals))
      .selectExpr("brand_a", "brand_b", "pair_count", "count_a", "count_b", "n_orders",
        "pair_count * 1000000 DIV n_orders AS support_ppm",
        "pair_count * 1000000 DIV count_a AS conf_ab_ppm",
        "pair_count * 1000000 DIV count_b AS conf_ba_ppm",
        // two-step floor, NOT pair*n*1e6/(ca*cb): the single-step
        // numerator overflows int64 around SF10+ (Spark would wrap,
        // DuckDB would raise — a silent oracle split); this shape's
        // intermediate is bounded by 1e6·n_orders at any scale, and
        // both engines floor identically at each step
        "(pair_count * 1000000 DIV count_a) * n_orders DIV count_b AS lift_ppm")
      .orderBy("brand_a", "brand_b")

  def qBasketRules(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.parquet(s, s"$dir/lineitem.parquet")
    val part = graft.sources.Tables.parquet(s, s"$dir/part.parquet")
    // ONE corpus shuffle (r13): brand rides in on the broadcast dim
    // join, then the distinct brands of each order collapse into a
    // sorted per-order ARRAY (map-side partial collect_set dedups
    // before the exchange — same shuffle volume as the old
    // `.distinct()`, which then still needed two more exchanges for
    // the pair self-join). Pair counts explode C(width, 2) pairs per
    // order from the sorted array — bounded by basket width, never by
    // catalog size — and item counts / totals read the same frame, so
    // nothing downstream rescans the corpus. localCheckpoint, not
    // CachePool: THREE consumers hang off it under one action (the
    // r12 two-branch cache race re-ran the scan+distinct per branch —
    // the "re-aggregates baskets twice" cost the r12 verdict flagged).
    val baskets = li
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"), col("p_brand"))),
        "l_partkey")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("p_brand"))).as("brands"))
      .localCheckpoint(true)
    val pairCounts = baskets.select(explode(flatten(transform(col("brands"),
        (x, i) => transform(slice(col("brands"), i + lit(2), size(col("brands"))),
          y => struct(x.as("brand_a"), y.as("brand_b")))))).as("p"))
      .groupBy(col("p.brand_a").as("brand_a"), col("p.brand_b").as("brand_b"))
      .agg(count(lit(1)).as("pair_count"))
    val itemCounts = baskets.select(explode(col("brands")).as("p_brand"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))
    val totals = baskets.agg(count(lit(1)).cast("long").as("n_orders"))
    basketRulesFromCounts(pairCounts, itemCounts, totals)
  }

  val qBasketRulesSql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey, p_brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |),
       |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM baskets),
       |ic AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt FROM baskets GROUP BY 1),
       |pc AS (
       |  SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
       |         CAST(count(*) AS BIGINT) AS pair_count
       |  FROM baskets x JOIN baskets y
       |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
       |  GROUP BY 1, 2
       |)
       |SELECT brand_a, brand_b, pair_count, a.cnt AS count_a, b.cnt AS count_b,
       |       n_orders,
       |       pair_count * 1000000 // n_orders AS support_ppm,
       |       pair_count * 1000000 // a.cnt AS conf_ab_ppm,
       |       pair_count * 1000000 // b.cnt AS conf_ba_ppm,
       |       (pair_count * 1000000 // a.cnt) * n_orders // b.cnt AS lift_ppm
       |FROM pc JOIN ic a ON brand_a = a.p_brand JOIN ic b ON brand_b = b.p_brand
       |CROSS JOIN n
       |WHERE pair_count >= $MinPairSupport
       |ORDER BY brand_a, brand_b""".stripMargin
}
