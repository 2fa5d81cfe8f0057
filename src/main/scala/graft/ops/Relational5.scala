package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Calendar analytics and data-quality auditing over the event stream —
 * the reporting layer a warehouse builds on the reference's feed.
 */
object Relational5 {

  /**
   * Gaps-and-islands: each user's longest streak of CONSECUTIVE active
   * days, via the classic `day − row_number()` group constant (runs of
   * consecutive days share it). Two window passes over one user_id
   * partitioning — a single shuffle; day arithmetic is exact integers.
   */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = Tables.events(spark, dir)
      .select(col("user_id"), Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .select(col("user_id"), col("day"))
      .distinct()
    days
      .withColumn("grp", col("day") - row_number().over(byUser))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"),
        min(col("day")).as("first_day"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        min(col("first_day")).as("first_day"))
      .orderBy(col("user_id"))
  }

  /**
   * Rolling 7-day distinct actives: daily DAU plus the trailing-week
   * distinct-user count. Sliding-window DISTINCT can't come from a
   * running sum (distinct doesn't subtract), so each (user, day) fact
   * is replicated onto the ≤ 7 calendar days whose window covers it —
   * BOUNDED replication (×7) followed by one exact pre-aggregated
   * count, the q95/q113 Expand-free discipline. Days with no activity
   * simply don't appear (the fixture stream has none).
   */
  def rollingActives(spark: SparkSession, dir: String): DataFrame = {
    val perDay = Tables.events(spark, dir)
      .select(col("user_id"), Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .select(col("user_id"), col("day"))
      .distinct()
    val dau = perDay.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val weekly = perDay
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("rolling7_users"))
    // keep only days that exist in the stream (window ends beyond the
    // last day would otherwise appear)
    dau.join(weekly, "day")
      .select(col("day"), col("dau"), col("rolling7_users"))
      .orderBy(col("day"))
  }

  /**
   * Share-of-parent: each nation's customer-balance total as a share
   * of its region's, computed with a window sum over the aggregated
   * (25-row) nation table — the hierarchy-percentage shape. Totals are
   * exact decimals; only the final share divides as doubles.
   */
  def regionShare(spark: SparkSession, dir: String): DataFrame = {
    val byRegion = Window.partitionBy(col("r_name"))
    val nations = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("nation_bal"),
        count(lit(1)).as("n_customers"))
    nations
      .withColumn("region_bal", sum(col("nation_bal")).over(byRegion))
      .select(col("r_name"), col("n_name"), col("n_customers"),
        col("nation_bal").cast("double").as("nation_bal"),
        col("region_bal").cast("double").as("region_bal"))
      .withColumn("share", col("nation_bal") / col("region_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /**
   * Time-series gap-fill with forward fill: each user's daily value
   * total, densified onto their personal day spine (min..max active
   * day) and forward-filled through the gaps via
   * `last(_, ignoreNulls)` over an unbounded-preceding frame — the
   * interpolation shape every metrics store needs. The spine explode
   * is bounded by the calendar span; the fill is one user-partitioned
   * window (single shuffle). Daily totals are exact decimals surfaced
   * as doubles, so the filled copies are bit-replayable.
   */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), Tables.epochMs(col("ts")).as("ts_ms"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("v")).cast("double").as("observed"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("observed"), ignoreNulls = true).over(byUser))
      .select(col("user_id"), col("day"), col("observed"), col("filled"))
      .orderBy(col("user_id"), col("day"))
  }

  /**
   * FILTER-clause aggregation: one pass computing differently-filtered
   * aggregates per group — the idiomatic replacement for N separate
   * filtered scans (or CASE-wrapped sums). Expressed in SQL because
   * FILTER (WHERE ...) IS the surface being exercised; Catalyst plans
   * it as conditional aggregation in a single hash-agg pass.
   */
  def filteredAggs(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("g5_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("g5_customer")
    spark.sql(
      """SELECT c.c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS n_filled,
        |  COUNT(*) FILTER (WHERE o.o_totalprice > 200000.0) AS n_big,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o.o_orderpriority = '1-URGENT') AS DOUBLE)
        |    AS urgent_revenue,
        |  COUNT(DISTINCT o.o_custkey) FILTER (WHERE o.o_totalprice > 200000.0)
        |    AS n_big_customers
        |FROM g5_orders o JOIN g5_customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /**
   * Data-quality audit (the Deequ-style constraint pass): one summary
   * row per audited table with exact violation counts and pass
   * booleans — key uniqueness, null rates, referential integrity,
   * range constraints. Each check is an aggregate over one scan (or
   * one anti-join for the FK check); nothing is collected row-wise.
   * The oracle recomputes every count, so a silently-drifting fixture
   * or a broken loader fails the hash gate.
   */
  def dataQualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val o = orders.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_keys"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_fk"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("range_viol"))
      .withColumn("table_name", lit("orders"))
    val orphanOrders = orders.join(customer,
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_fk"))
    val l = lineitem.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber"))).as("dup_keys"),
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_fk"),
      sum(when(col("l_quantity") <= 0.0 || col("l_discount") < 0.0 ||
        col("l_discount") > 1.0, 1L).otherwise(0L)).as("range_viol"))
      .withColumn("table_name", lit("lineitem"))
    val orphanLines = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_fk"))
    o.crossJoin(orphanOrders)
      .unionByName(l.crossJoin(orphanLines))
      .select(col("table_name"), col("n_rows"), col("dup_keys"),
        col("null_fk"), col("orphan_fk"), col("range_viol"))
      .withColumn("passed",
        col("dup_keys") === 0L && col("null_fk") === 0L &&
          col("orphan_fk") === 0L && col("range_viol") === 0L)
      .orderBy(col("table_name"))
  }
}
