package graft.ops

import graft.SparkSpec
import graft.model.Tables
import graft.plans.PlanChecks
import org.apache.spark.sql.functions._

class Relational7Spec extends SparkSpec {

  test("shipping priority: segment/date predicates hold, top-k plan") {
    val df = Relational7.shippingPriority(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // descending revenue with orderkey tiebreak
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) > b.getDouble(3) ||
        (a.getDouble(3) == b.getDouble(3) && a.getLong(0) < b.getLong(0)))
    }
    // spot-verify the head order's qualification end-to-end
    val top = rows.head.getLong(0)
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") === top)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .collect().head
    assert(o.getAs[String]("c_mktsegment") == "BUILDING")
    val cnt = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === top &&
        col("l_shipdate") > lit("1998-06-30").cast("timestamp")).count()
    assert(cnt > 0)
    assert(PlanChecks.audit(df).hasTakeOrderedAndProject,
      "top-10 must plan as TakeOrderedAndProject, not a global sort")
  }

  test("order priority check: semi-join counts bounded by window orders") {
    val rows = Relational7.orderPriorityCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    val windowOrders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp")).count()
    assert(rows.map(_.getLong(1)).sum <= windowOrders)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
  }

  test("nation volume: no same-nation pairs, years bounded, nations broadcast") {
    val df = Relational7.nationVolume(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1), s"same-nation pair: $r")
      assert(r.getLong(2) == 1996L || r.getLong(2) == 1997L)
      assert(r.getDouble(3) > 0.0)
    }
    assert(PlanChecks.audit(df).broadcastHashJoins >= 2,
      "the two hinted nation joins must be broadcast")
  }

  test("market share: numerator bounded by denominator, one double division") {
    val rows = Relational7.marketShare(spark, sf).collect()
    rows.foreach { r =>
      val (num, den, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(num >= 0.0 && num <= den, s"$r")
      assert(share == num / den, "share must be the single division of the sums")
    }
  }

  test("product profit: exact decimal difference matches a direct recompute") {
    val rows = Relational7.productProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    val (nation, yr) = (rows.head.getString(0), rows.head.getLong(1))
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("n_name") === nation && year(col("o_orderdate")) === yr)
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)")) -
        sum((col("l_quantity") * lit(0.5)).cast("decimal(18,2)") *
          col("p_retailprice").cast("decimal(18,2)"))).cast("double"))
      .collect().head.getDouble(0)
    assert(rows.head.getDouble(2) == expected)
  }

  test("returned items: lost revenue positive, top-20 heap plan") {
    val df = Relational7.returnedItems(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
    assert(PlanChecks.audit(df).hasTakeOrderedAndProject)
  }

  test("important parts: every survivor clears twice the average value") {
    val rows = Relational7.importantParts(spark, sf).collect()
    // recompute the per-part values and the threshold directly
    val eu = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE").select(col("s_suppkey"))
    val vals = Tables.lineitem(spark, sf)
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val thresh = 2.0 * vals.values.sum / vals.size
    val got = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = vals.filter(_._2 > thresh)
    // float threshold vs exact decimal cross-multiply can only disagree
    // within double rounding of the boundary; sets must match here
    assert(got.keySet == expect.keySet,
      s"survivor drift: got ${got.keySet}, expected ${expect.keySet}")
  }

  test("ship delay bands: per-band line counts partition the join") {
    val rows = Relational7.shipDelayBands(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("fast", "normal", "slow")))
    val totalLines = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == totalLines)
  }

  test("customer distribution: zero-order customers kept, totals add up") {
    val rows = Relational7.customerDistribution(spark, sf).collect()
    val nCustomers = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nCustomers,
      "every customer lands in exactly one order-count bucket")
    // the aggregate counts only non-pending orders
    val nonPending = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "P").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == nonPending)
  }

  test("discounted revenue: single row consistent with a direct filter") {
    val row = Relational7.discountedRevenue(spark, sf).collect().head
    assert(row.getLong(1) >= 0L)
    if (row.getLong(1) > 0) assert(row.getDouble(0) > 0.0)
  }

  test("waiting suppliers: only-late-supplier property holds on a sample") {
    val rows = Relational7.waitingSuppliers(spark, sf).collect()
    // qualifying orders recomputed directly: finished, multi-supplier,
    // exactly one late supplier
    val base = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", Tables.epochMs(col("l_shipdate")) >
        Tables.epochMs(col("o_orderdate")) + lit(60L * 86400000L))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
    val qual = base.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ns"),
        sum(when(col("supp_late"), 1L).otherwise(0L)).as("nl"))
      .filter(col("ns") > 1 && col("nl") === 1)
    val expectTotal = base.filter(col("supp_late"))
      .join(qual.select(col("l_orderkey")), Seq("l_orderkey")).count()
    assert(rows.map(_.getLong(1)).sum <= expectTotal)
    if (expectTotal > 0) assert(rows.nonEmpty)
  }

  test("part supplier counts: distinct suppliers bounded, exclusions hold") {
    val rows = Relational7.partSupplierCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    val nSupp = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") >= 0.0).count()
    rows.foreach { r =>
      assert(r.getString(0) != "Brand#5" && r.getString(1) != "PROMO")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= nSupp)
    }
  }

  test("forecast revenue: filters pushed to the scan, single row") {
    val df = Relational7.forecastRevenue(spark, sf)
    val row = df.collect().head
    assert(row.getLong(1) >= 0L)
    if (row.getLong(1) > 0) assert(row.getDouble(0) > 0.0)
    val audit = PlanChecks.audit(df)
    assert(audit.joins == 0, "Q6 must be join-free")
    // the 7-entry filter list overflows the plan renderer's width and
    // never closes its bracket, so PlanChecks' extractor misses it —
    // check the raw plan string instead
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"date bounds must reach the scan:\n$plan")
  }

  test("plan quality: fact joins unhinted, no cartesian products") {
    for (df <- Seq(
        Relational7.shippingPriority(spark, sf),
        Relational7.nationVolume(spark, sf),
        Relational7.marketShare(spark, sf),
        Relational7.productProfit(spark, sf),
        Relational7.returnedItems(spark, sf),
        Relational7.shipDelayBands(spark, sf),
        Relational7.customerDistribution(spark, sf),
        Relational7.waitingSuppliers(spark, sf),
        Relational7.partSupplierCounts(spark, sf))) {
      df.collect()
      val a = PlanChecks.audit(df)
      assert(a.nestedLoopJoins == 0, s"cartesian/NLJ in: ${df.queryExecution}")
    }
    // the only hinted broadcasts anywhere in the family are
    // region/nation (fixed-size) and single-row scalar aggregates
    for (df <- Seq(
        Relational7.nationVolume(spark, sf),
        Relational7.marketShare(spark, sf),
        Relational7.importantParts(spark, sf)))
      assert(PlanChecks.forcedBroadcastViolations(df).isEmpty)
  }
}
