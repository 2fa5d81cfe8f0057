package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * General relational operator library: the reference's query semantics
 * generalized to a full batch surface (SURVEY.md §7 step 3) — joins,
 * aggregations, window functions, rollup, set ops, scalar functions.
 *
 * Numeric-determinism policy (oracle parity): monetary doubles are cast
 * to DECIMAL(18,2) *before* summation so the sum is exact and
 * order-independent, then cast back to double. Averages are computed as
 * exact-decimal-sum ÷ count in double. Comparisons/sorts always carry a
 * unique integer tiebreak key.
 *
 * Scale notes:
 *  - dimension joins (region/nation/customer) are marked `broadcast` —
 *    at 100 TB the fact side streams map-side, no shuffle;
 *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once
 *    and AQE handles skew;
 *  - top-k uses `orderBy().limit()` → TakeOrderedAndProject (per
 *    partition heap + driver merge, no global sort).
 */
object Relational {

  /** Exact, order-independent money sum: decimal-widen, sum, back to
    * double. DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  private def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  private def moneyAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))

  /** TPC-H Q1-style pricing summary: the canonical scan → hash-agg →
    * sort pipeline (map-side partial agg keeps the shuffle tiny: 4
    * groups regardless of input size). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("sum_disc_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Snowflake dimension join: customer ⋈ nation ⋈ region, aggregated
    * per region/nation. Both dims broadcast (25 + 5 rows). */
  def dimensionJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Fact-fact join + top-k revenue: orders ⋈ lineitem grouped on the
    * join key. The revenue aggregate runs BEFORE the orders join
    * (o_orderkey is orders' unique key, so grouping the joined rows by
    * (o_orderkey, o_orderdate, o_orderpriority) is row-identical to
    * aggregating lineitem by l_orderkey and attaching the two orders
    * columns afterwards — decimal sums are exact, so the regroup
    * cannot drift): the exchange then carries (key, decimal) instead
    * of (key, date, priority, decimal), the group hash map keys one
    * long instead of a 3-tuple, and every lineitem row skips the
    * orders hash probe it previously paid pre-aggregation. */
  def revenueTopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .select(
        col("o_orderkey"),
        Tables.epochMs(col("o_orderdate")).as("o_orderdate_ms"),
        col("o_orderpriority"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Left-semi join: customers having at least one qualifying order
    * (EXISTS). Semi-join keeps only the probe side — half the shuffle
    * width of an inner join + distinct. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 150000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Left-anti join: customers with no high-value orders (NOT EXISTS). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 250000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Window function: top-3 customers per nation by account balance
    * (row_number with deterministic tiebreak). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("rnk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rnk"))
  }

  /** Window frame: running order-value total per customer over time.
    * Decimal-exact prefix sums → identical in any evaluation order. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        Tables.epochMs(col("o_orderdate")).as("o_orderdate_ms"),
        col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Lag/lead: per-user gap between consecutive events (ms). */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ms", lag(Tables.epochMs(col("ts")), 1).over(w))
      .withColumn("gap_ms", Tables.epochMs(col("ts")) - col("prev_ms"))
      .filter(col("gap_ms").isNotNull)
      .select(col("user_id"), col("event_id"), col("gap_ms"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ROLLUP over two grouping columns; group keys COALESCEd to 'ALL' so
    * output carries no NULL keys (NULL sort order differs across
    * engines). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to the (flag, status) grain BEFORE the rollup: the
    // Expand operator multiplies its input by the number of grouping
    // sets, so rolling up the raw fact table triples the rows feeding
    // the exchange — rolling up the pre-aggregated group table expands
    // a handful of rows instead (guide §2.3 "aggregate before you
    // shuffle"). Row-identical: subtotals are sums of exact per-group
    // decimal sums and counts.
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n0"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("s0"))
    base
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("n0")).as("n"),
        sum(col("s0")).cast("double").as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_price"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** Set operations: (BUILDING customers ∪ big-order customers) ∖
    * automobile-segment customers, as key sets. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val b = o.filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("custkey"))
    val x = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("custkey"))
    a.union(b).distinct().except(x).orderBy("custkey")
  }

  /** Distinct aggregates: exact distinct counts per group. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Scalar function sampler: string/math/date built-ins with exact
    * cross-engine semantics (no float rounding functions). */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        abs(col("p_size") - lit(25)).cast("long").as("size_dist"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      // pin before the presentation sort (map-only; guide §2.4)
      .transform(d => graft.ops.GlobalOrder.pinnedSort(d, col("p_partkey")))

  /** Date functions: monthly order rollup keyed by formatted month. */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("month")

  /** Conditional aggregation: CASE WHEN inside aggregates. */
  def caseWhenAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L)).as("n_big"))
      .orderBy("o_orderpriority")

  /** GROUP BY + HAVING: nations with enough customers. */
  def havingFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .filter(col("n_customers") >= 5)
      .orderBy("c_nationkey")

  /** Orders above their customer's average order value — correlated
    * EXISTS semantics as an aggregate + re-join. The per-key aggregate
    * shares the join key, so AQE coalesces to one shuffle of each side. */
  def aboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val avgByCust = o.groupBy(col("o_custkey").as("ck"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_price"))
    o.join(avgByCust, o("o_custkey") === avgByCust("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Multi-way join across the full snowflake: revenue by region over
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region. */
  def snowflakeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    // customer grows with scale — no broadcast hint: AQE picks BHJ while
    // it fits and falls back to shuffle join at 100×; a forced hint
    // would defeat exactly that fallback. nation/region are fixed-size.
    // The revenue aggregate is PUSHED BELOW the join chain (guide §2.3
    // "aggregate before you shuffle"): lineitem collapses to one
    // (orderkey, decimal sum, count) row per order before anything is
    // joined — row-identical because o_orderkey is orders' unique key
    // (each order meets exactly one pre-aggregated row, decimal partial
    // sums are exact, and the per-region regroup of per-order sums is
    // the same multiset sum) — so the widest exchange of the query
    // moves order-cardinality aggregates, never item-cardinality rows.
    val perOrder = l.groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)"))
          .as("rev"),
        count(lit(1)).as("n_items"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(col("rev")).cast("double").as("revenue"),
        sum(col("n_items")).as("n_items"))
      .orderBy("r_name")
  }
}
