package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("semi and anti join partition the customer set") {
    val all = Tables.customer(spark, sf).count()
    val semiHi = Relational.semiJoin(spark, sf).count()
    // anti uses a different threshold; check partition with matching sets
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 250000.0)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = Relational.antiJoin(spark, sf).count()
    assert(semi + anti == all)
    assert(semiHi <= all)
  }

  test("dimension joins are planned as broadcasts") {
    val plan = Relational.dimensionJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dim join should not sort-merge")
  }

  test("window rank emits at most 3 rows per nation, ranks contiguous from 1") {
    val df = Relational.windowRank(spark, sf).cache()
    val perNation = df.groupBy("c_nationkey").agg(
      count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(perNation.filter(col("n") > 3 || col("mx") > 3 || col("mn") =!= 1).count() == 0)
  }

  test("running total is monotone per customer and ends at the customer sum") {
    val rt = Relational.runningTotal(spark, sf)
    val lastPerCust = rt.groupBy("o_custkey").agg(max("running_total").as("last"))
    val direct = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    val joined = lastPerCust.join(direct, "o_custkey")
      .filter(abs(col("last") - col("total")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("rollup grand total equals table count") {
    val r = Relational.rollupAgg(spark, sf)
    val grand = r.filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .select("n").head.getLong(0)
    assert(grand == Tables.lineitem(spark, sf).count())
  }

  test("set ops: result disjoint from excluded set") {
    val res = Relational.setOps(spark, sf)
    val auto = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("custkey"))
    assert(res.join(auto, "custkey").count() == 0)
  }

  test("pricing summary groups are disjoint and counts total") {
    val ps = Relational.pricingSummary(spark, sf)
    val n = ps.agg(sum("count_order")).head.getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(n == expected)
  }

  test("above-avg orders are a strict subset with higher-than-avg prices") {
    val res = Relational.aboveCustomerAvg(spark, sf)
    assert(res.count() > 0)
    assert(res.count() < Tables.orders(spark, sf).count())
  }
}
