package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Correlated/scalar-subquery shapes: results must agree with explicit
  * join/window reformulations, and the physical plans must show
  * DECORRELATION — the filter subqueries become joins, never per-row
  * re-execution.
  */
class SubquerySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_scalar_subquery matches an explicit aggregate-join reformulation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val part = spark.read.parquet(s"$dir/part.parquet")
    val per = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("sq"))
    val expected = li.join(per, "l_partkey")
      .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("sq"))
      .join(part, col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType)
        .as("small_lot_revenue"), count(lit(1)).as("n_small"))
      .orderBy("p_brand")
    val got = Relational.qScalarSubquery(spark, dir)
    assert(got.collect().toSeq == expected.collect().toSeq)
    // correlated scalar subqueries are decorrelated: none survive to the
    // physical plan as per-row subquery expressions
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("scalar-subquery"), s"correlated subquery not decorrelated:\n$plan")
  }

  test("q_exists_join matches a group-level reformulation and plans as semi/anti joins") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "F")
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
    val lo = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
    // per finished order: all suppliers, and the set of late suppliers
    val per = lo.groupBy("o_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
    val expected = lo.filter(col("late"))
      .join(per.filter(col("n_supp") >= 2 && col("n_late_supp") === 1), "o_orderkey")
      .join(supp, col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
    val got = Relational.qExistsJoin(spark, dir)
    assert(got.collect().toSeq == expected.collect().toSeq)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS did not become a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not become an anti join")
  }

  test("q_having_subquery matches a broadcast-threshold reformulation") {
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val tot = ord.agg(countDistinct("o_custkey").as("ncust"), count(lit(1)).as("ntot"))
    val expected = ord.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("spend"))
      .crossJoin(tot)
      .filter(col("n_orders") * col("ncust") > col("ntot"))
      .select("o_custkey", "n_orders", "spend")
      .orderBy("o_custkey")
    val got = Relational.qHavingSubquery(spark, dir)
    assert(got.collect().toSeq == expected.collect().toSeq)
  }
}
