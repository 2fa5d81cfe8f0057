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
   * Per-key approximate distinct with envelope gating (the q53
   * discipline at key grain): HLL distinct users per event_type next
   * to the exact count, plus a boolean asserting the sketch landed
   * within ±5% (5σ at rsd 1%) — the oracle emits the exact column and
   * literal TRUE, so HLL drift fails the hash gate. This is the
   * dashboard-class shape where the exact distinct would shuffle the
   * whole key universe at 100 TB and the sketch ships ~kilobytes.
   */
  def approxDistinctPerKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // ONE aggregate over the deduplicated pairs computes BOTH sides:
    // the exact count, and the HLL sketch — which is duplicate-
    // insensitive (max-of-registers), so feeding it each distinct
    // (event_type, user_id) pair once yields the identical register
    // state the raw-scan pass produced (r17 optimization round: the
    // separate raw-table HLL pass and its scan+aggregate are dropped;
    // guide §2.4 "do fewer passes"). Still no countDistinct Expand.
    ev.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .withColumn("approx_ok",
        abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users") < 0.05)
      .select(col("event_type"), col("exact_users"), col("approx_ok"))
      .orderBy(col("event_type"))
  }

  /**
   * Deterministic WEIGHTED sampling via ticket replication: a document
   * with weight w (chars/100, ≥1) gets w md5 lottery tickets; its draw
   * is the minimum ticket hash, and the sample is the k smallest draws
   * — heavier documents hold more tickets, so they win
   * proportionally more often, yet the outcome is a pure function of
   * the data (repartition/rerun-stable, oracle-replayable), unlike
   * rand()-based A-ES whose u^(1/w) also hits the cross-engine log
   * trap. Replication is bounded by the weight cap; the per-doc min
   * collapses map-side before the top-k cut (TakeOrderedAndProject).
   */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        greatest(expr("n_chars div 100"), lit(1L)).as("tickets"))
      .withColumn("t", explode(expr("sequence(1, tickets)")))
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":"),
        col("t").cast("string"))))
      .groupBy(col("doc_id"), col("n_chars"), col("tickets"))
      .agg(min(col("h")).as("draw"))
      .orderBy(col("draw"), col("doc_id"))
      .limit(k)

  /**
   * Group-wise least-squares regression (value over time) from EXACT
   * moments: Σx, Σy, Σxy, Σx² accumulate as longs/decimals (x =
   * seconds since the fixture epoch — bounded integers; y = the
   * decimal-cast value), so the slope/intercept are single fixed-order
   * double expressions over exact sums — the regr_slope/regr_intercept
   * surface without the cross-partition float-fold nondeterminism.
   * One hash aggregation; moments combine map-side.
   */
  def regressionSlope(spark: SparkSession, dir: String): DataFrame = {
    val EpochMs = 1704067200000L // 2024-01-01, the fixture origin
    Tables.events(spark, dir)
      .select(col("event_type"), Tables.epochMs(col("ts")).as("ts_ms"),
        col("value").cast("decimal(18,2)").as("y"))
      .withColumn("x", expr(s"(ts_ms - $EpochMs) div 1000"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // decimal-cast sum inputs: long Σx²/Σx would wrap silently on a
        // big enough partition (per-row x*x stays well inside Long)
        sum(col("x").cast("decimal(28,0)")).as("sx"),
        sum(col("y")).cast("double").as("sy_d"),
        sum(col("y") * col("x").cast("decimal(18,0)")).cast("double").as("sxy_d"),
        sum((col("x") * col("x")).cast("decimal(28,0)")).as("sxx"))
      .withColumn("slope",
        (col("n").cast("double") * col("sxy_d")
          - col("sx").cast("double") * col("sy_d"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("intercept",
        (col("sy_d") - col("slope") * col("sx").cast("double"))
          / col("n"))
      .select(col("event_type"), col("n"), col("slope"), col("intercept"))
      .orderBy(col("event_type"))
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
      // distinct over a STRUCT, not the column list: multi-column
      // countDistinct drops tuples where ANY column is NULL, while
      // DuckDB's COUNT(DISTINCT (a,b)) counts NULL-bearing tuples —
      // struct(a,b) is never null, so both engines count identically
      // even on NULL-keyed fixtures (round-5 advice)
      (count(lit(1)) -
        countDistinct(struct(col("l_orderkey"), col("l_linenumber")))).as("dup_keys"),
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
