package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TPC-H analog completion: the classic decision-support shapes not yet
 * covered by earlier rounds (Q3/Q4/Q7/Q8/Q9/Q10/Q11/Q12/Q13/Q16/Q19/
 * Q21 analogs), adapted to the fixture star schema (FIXTURES.md — no
 * partsupp table, no l_shipmode/commitdate/receiptdate columns, so the
 * missing attributes are re-expressed over what exists: lineitem is
 * the partsupp proxy, ship-minus-order delay the lateness signal).
 *
 * Shared scale discipline (the q26 precedent, Relational.scala:251):
 * dimension joins stay UNHINTED except the fixed-size region/nation
 * tables — customer/part/supplier grow with the data, so AQE decides
 * broadcast at fixture scale and falls back to a shuffle join at 100×
 * instead of a driver OOM. Fact⋈fact joins key on l_orderkey and the
 * downstream aggregate reuses that partitioning where the group key is
 * the join key. Money arithmetic is decimal-widened before summation
 * (exact, order-independent); date arithmetic compares epoch-ms BIGINTs
 * so Spark and DuckDB never disagree on interval semantics; calendar
 * years are `year()` cast to long on the Spark side (DuckDB's year()
 * is BIGINT).
 */
object Relational7 {

  /** Exact revenue sum: Σ extprice·(1−discount) over DECIMAL(18,2),
    * emitted as double. DuckDB mirror:
    * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
    *          CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE). */
  private def revSum: Column =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double")

  private def ts(s: String): Column = lit(s).cast("timestamp")

  private val DayMs = 86400000L

  /**
   * Q3 analog — shipping priority: the 10 highest-revenue orders taken
   * by BUILDING-segment customers before the cutoff whose goods had
   * not all shipped by it. Both date filters push to the parquet scans
   * (`PushedFilters`); the segment-filtered customer list joins orders
   * unhinted (AQE broadcasts at fixture scale, shuffles at 100×), and
   * the revenue aggregate keys on the lineitem⋈orders join key, so the
   * fact side moves through ONE exchange. Top-10 is
   * TakeOrderedAndProject — per-partition heaps, no global sort.
   */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = ts("1998-06-30")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revSum.as("revenue"))
      .select(col("o_orderkey"),
        Tables.epochMs(col("o_orderdate")).as("o_orderdate_ms"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /**
   * Q4 analog — order priority check: orders placed in 1997H1 with at
   * least one line shipped more than 60 days after the order date
   * (the fixture has no commit/receipt dates; ship-minus-order delay
   * is the lateness signal). The EXISTS is a LEFT SEMI join on
   * l_orderkey with the delay comparison as the join residual — the
   * probe side never widens, and lineitem contributes each order at
   * most once regardless of how many lines are late.
   */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1997-01-01") &&
        col("o_orderdate") < ts("1997-07-01"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          Tables.epochMs(l("l_shipdate")) >
            Tables.epochMs(o("o_orderdate")) + lit(60L * DayMs),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /**
   * Q7 analog — cross-nation trade volume: revenue shipped from a
   * supplier's nation to a (different) customer's nation, per ship
   * year. Nation names ride in via two broadcast-hinted joins (nation
   * is one of the two fixed-size tables the repo's forced-broadcast
   * audit allows); supplier and customer join unhinted. The only
   * fact⋈fact exchange is lineitem⋈orders on l_orderkey; the final
   * aggregate's 25·24·2 groups collapse map-side.
   */
  def nationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(n.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revSum.as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /**
   * Q8 analog — market share: of the PROMO-part revenue sold into
   * ASIA-region customers, the fraction supplied by NATION_3, per
   * order year. Numerator and denominator are decimal-exact
   * conditional sums in ONE aggregate pass (the q58 promo-share
   * discipline) with a single double division at the end; region and
   * nation broadcast by hint, every growing table joins unhinted.
   */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val asianCust = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"),
        col("o_custkey"),
        // o_year on the order side: one year() per order row, and the
        // build side ships a long, not a date (r18, the q205 change)
        year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asianCust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          .as("nation_rev"),
        sum(rev).cast("double").as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy(col("o_year"))
  }

  /**
   * Q9 analog — product-type profit: per supplier nation and order
   * year, revenue minus a cost proxy of half the part's retail price
   * per unit (no partsupp table ⇒ no ps_supplycost). The 0.5 factor is
   * folded into the QUANTITY before the decimal cast: quantities are
   * integral doubles, so qty·0.5 is exactly representable and the
   * decimal cast never rounds — a 0.6 would round a double product and
   * invite half-up/half-even drift between engines. Profit is the
   * DIFFERENCE OF DECIMAL SUMS cast to double once — never a float
   * subtraction per row.
   */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_retailprice"))
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")
    val cost = (col("l_quantity") * lit(0.5)).cast("decimal(18,2)") *
      col("p_retailprice").cast("decimal(18,2)")
    // o_year is computed on the ORDER side before the join (one year()
    // per order row instead of one per joined item row, and the
    // broadcast/build side carries a long instead of a date) —
    // grouping on the joined column is the same value row for row
    // (r18; guide §2.3 "project before the exchange"; same-session A/B
    // 1.87 → 1.62 s at sf0.1)
    val oYear = Tables.orders(spark, dir).select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(oYear, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("supp_nation"), col("o_year"))
      .agg((sum(rev) - sum(cost)).cast("double").as("profit"))
      .orderBy(col("supp_nation"), col("o_year"))
  }

  /**
   * Q10 analog — returned-item losers: the 20 customers losing the
   * most revenue to returns ('R' lines) over three quarters. The
   * aggregate runs BEFORE the customer join — revenue collapses to
   * customer cardinality on the l_orderkey⋈o_orderkey exchange and the
   * o_custkey regroup, then the name/segment join touches only
   * aggregated rows. Top-20 via TakeOrderedAndProject.
   */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1997-01-01") &&
        col("o_orderdate") < ts("1997-10-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(revSum.as("lost_revenue"))
    perCust
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /**
   * Q11 analog — important stock: parts whose shipped value through
   * EUROPE-region suppliers exceeds twice the average per-part value.
   * No partsupp ⇒ lineitem extended price is the stock-value proxy.
   * The threshold is the Q11 scalar-subquery shape made SCALE-FREE: a
   * fixed fraction of the grand total empties out as the part universe
   * grows, whereas value > 2·total/n keeps a stable survivor rate —
   * and it is evaluated as the cross-multiplied DECIMAL comparison
   * `val·n > 2·total` (both sides exact), not a float division. The
   * single-row total broadcasts (q59 scalar pattern).
   */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val eu = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    // perPart feeds two consumers (the total and the filter join), but
    // pinning it measured FLAT in a same-session A/B at sf0.1 —
    // Spark's exchange reuse already dedups the identical aggregate
    // subtree here, so the pin would only add a materialization
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("val_dec"))
    val total = perPart.agg(
      sum(col("val_dec")).as("total_dec"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total)) // single-row scalar
      .filter(col("val_dec") * col("n_parts") > col("total_dec") * lit(2))
      .select(col("l_partkey"), col("val_dec").cast("double").as("stock_value"))
      .orderBy(col("stock_value").desc, col("l_partkey"))
  }

  /**
   * Q12 analog — shipping-delay bands: lineitems bucketed by how long
   * after the order date they shipped (≤30d fast, ≤90d normal, else
   * slow — the fixture has no l_shipmode), counting high-priority
   * (URGENT/HIGH) vs lower-priority orders per band, Q12's CASE
   * structure. One fact⋈fact exchange; the 3-group aggregate collapses
   * map-side. The band thresholds compare epoch-ms BIGINTs directly
   * (30/90 days in ms) — no division, so no integer-vs-float `/`
   * semantics to disagree on.
   */
  def shipDelayBands(spark: SparkSession, dir: String): DataFrame = {
    val delayMs = Tables.epochMs(col("l_shipdate")) -
      Tables.epochMs(col("o_orderdate"))
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("band",
        when(delayMs <= lit(30L * DayMs), "fast")
          .when(delayMs <= lit(90L * DayMs), "normal")
          .otherwise("slow"))
      .groupBy(col("band"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("band"))
  }

  /**
   * Q13 analog — customer order-count distribution: how many customers
   * placed k orders, INCLUDING the zero-order customers a plain
   * orders-side aggregate would drop (the left outer join is the whole
   * point of Q13). First aggregate keys on the join key (one
   * exchange); the distribution regroup runs over customer-cardinality
   * rows. Pending ('P') orders excluded, mirroring Q13's comment
   * filter.
   */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") =!= "P")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /**
   * Q19 analog — OR-of-ANDs discounted revenue: three
   * (brand, size-range, quantity-range) branches unioned by OR inside
   * one predicate — the disjunctive-pushdown shape (Catalyst splits
   * the part-side conjuncts below the join; the scan's PushedFilters
   * carries the OR). Single-row output: group-less decimal-exact
   * revenue + line count.
   */
  def discountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch = (col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" &&
        col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" &&
        col("p_size").between(1, 50) && col("l_quantity").between(20, 40))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(revSum.as("revenue"), count(lit(1)).as("n_lines"))
  }

  /**
   * Q6 analog — forecasting revenue change: the canonical
   * scan-filter-aggregate with ZERO joins; revenue that would return
   * if mid-band discounts on small quantities were dropped for a year.
   * Every predicate (two timestamp bounds, a double range, a quantity
   * cap) pushes to the parquet scan — `PushedFilters` carries all of
   * them, row groups outside the ship-year never decompress — and the
   * group-less decimal-exact aggregate collapses map-side to one row.
   * Discount literals compare as doubles in BOTH engines (DuckDB
   * promotes its decimal literal), so the band edges cannot drift.
   */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /**
   * Q21 analog — suppliers who kept orders waiting: late lines (>60d
   * ship delay) in finished multi-supplier orders where that supplier
   * was the ONLY late one. Q21's EXISTS/NOT-EXISTS double self-join is
   * re-expressed as ONE per-(order, supplier) pre-aggregate — n_supp
   * and n_late_supp per order come from counting the pre-aggregated
   * rows (the q113 Expand-free discipline), and the qualifying late
   * supplier re-joins that same small table, so lineitem is scanned
   * once and shuffled once on the order key.
   */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        Tables.epochMs(col("l_shipdate")) >
          Tables.epochMs(col("o_orderdate")) + lit(60L * DayMs))
    // one row per (order, supplier): everything downstream — the
    // per-order counts AND the qualifying-supplier probe — reads this
    // table, pinned so the fact join runs once
    val perOrderSupp = GlobalOrder.pin(base
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late")))
    val perOrder = perOrderSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .select(col("l_orderkey"))
    perOrderSupp.filter(col("supp_late"))
      .join(perOrder, Seq("l_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /**
   * Q16 analog — supplier counts by part attributes: distinct
   * suppliers actually shipping each (brand, type, size) combination,
   * excluding one brand, PROMO parts, and negative-balance suppliers
   * (the complaints NOT-IN of Q16 as a LEFT ANTI join). Lineitem's
   * distinct (part, supplier) projection is the partsupp proxy — the
   * distinct collapses the fact table on its first exchange, and
   * everything after runs at catalog cardinality.
   *
   * r18 examined dropping the explicit `distinct()` (COUNT(DISTINCT
   * l_suppkey) dedups two-phase anyway, so the output is identical and
   * one exchange disappears): a same-session A/B measured it FLAT at
   * sf0.1 (1.21 vs 1.24 s), and at 100 TB it is strictly worse — once
   * `part` stops broadcasting, the part join must exchange the fact
   * projection, and the distinct-first shape ships the deduped
   * (partkey, suppkey) grain (~N/7 here) through that exchange instead
   * of every raw item row. Kept distinct-first (guide §2.3, shuffle
   * fewer bytes).
   */
  def partSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    ps.join(p, col("l_partkey") === col("p_partkey"))
      .join(complaints, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /**
   * Join-skew pre-flight audit: before shuffling 100 TB on a key, read
   * this table — the top-10 hottest values of the events `user_id` key
   * with exact row counts, each key's load relative to a perfectly
   * even spread (ppm; the MAX is the skew factor that sizes a salting
   * fan-out or justifies AQE skew-join), and the share of all rows the
   * hot set holds. The decision input behind `saltedJoin`
   * (Relational3) and the AQE skew rule (AqeSkewSpec): a 10⁶-ppm-flat
   * profile means plain hash partitioning is fine; a hot key at 50×
   * even means that one reducer gets 50 tasks' worth of rows.
   *
   * Plan: ONE hash aggregate to key cardinality, the hot set via the
   * rank-emitting bounded heap (never a global sort), totals broadcast
   * — the audit itself must be cheap enough to run before every big
   * join.
   */
  def joinSkewAudit(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    graft.plans.TopK.perKeyWithRank(
        counts.withColumn("g", lit(1)),
        Seq("g"), Seq(("n_rows", true), ("user_id", false)), k, "rnk")
      .crossJoin(broadcast(tot))
      .select(col("rnk"), col("user_id"), col("n_rows"),
        col("total_rows"), col("n_keys"),
        expr("(1000000 * n_rows * n_keys) div total_rows")
          .as("load_vs_even_ppm"),
        expr("(1000000 * n_rows) div total_rows").as("share_ppm"))
      .orderBy(col("rnk"))
  }
}
