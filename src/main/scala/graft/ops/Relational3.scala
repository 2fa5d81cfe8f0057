package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Third relational batch: TPC-H-style nested/derived-table analytics and
 * deterministic statistical aggregates.
 */
object Relational3 {

  /** Q18-style "large orders": orders whose line quantity total exceeds
    * a threshold, with customer context. Having-filter on a derived
    * aggregate, then joins — the agg shrinks the join input first. */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150.0)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    // customer is scale-growing: leave the join unhinted so AQE
    // broadcasts only while it fits
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("total_qty"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Q14-style promo revenue share: conditional revenue ratio over
    * lineitem ⋈ part. Numerator/denominator are decimal-exact; the final
    * division is one deterministic double op. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")
    // revenue is pre-aggregated to the (partkey, returnflag) grain
    // BEFORE the part join (guide §2.3 "aggregate before you shuffle"):
    // p_type is a function of p_partkey, so summing per-pair exact
    // decimal sums after the join is row-identical to summing item
    // rows — and the join probes part-cardinality aggregates instead
    // of every lineitem row.
    val perPart = l.groupBy(col("l_partkey"), col("l_returnflag"))
      .agg(sum(rev).as("rev0"))
    // part is scale-growing: unhinted, AQE decides broadcast vs shuffle
    perPart.join(p, col("l_partkey") === p("p_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev0"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(28,2)"))).cast("double")
          .as("promo_rev"),
        sum(col("rev0")).cast("double").as("total_rev"))
      .withColumn("promo_share", col("promo_rev") / col("total_rev"))
      .orderBy("l_returnflag")
  }

  /** Q15-style top supplier(s): suppliers achieving the maximum revenue
    * (scalar-subquery-on-max pattern). */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    // pinned: rev feeds the scalar max AND the filter probe — pinning
    // the supplier-cardinality aggregate computes the lineitem pass
    // once (same-session A/B 1.11 → 0.90 s at sf0.1; guide §2.4)
    val rev = graft.ops.GlobalOrder.pin(Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)"))
        .cast("double").as("total_rev")))
    val maxRev = rev.agg(max(col("total_rev")).as("mx"))
    val s = Tables.supplier(spark, dir)
    // maxRev is a 1-row scalar — always broadcast; supplier grows with
    // scale, so its join stays unhinted (post-filter it is ~1 row and
    // AQE broadcasts it at runtime anyway)
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("mx"))
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /**
   * Time-range self-join: pairs of events by the same user within 60
   * seconds of each other. The scalable plan buckets time (each event
   * equi-joins only its own and the adjacent minute bucket) so the
   * shuffle key is (user, bucket) — never an unbounded theta-join; the
   * range predicate is a residual filter. Oracle: the plain range
   * self-join, which is equivalent because a ≤60 s pair is always in
   * the same or adjacent bucket.
   */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), Tables.epochMs(col("ts")).as("ms"))
    val a = ev.withColumn("bucket", expr("ms div 60000"))
    // a successor within +60 s lives in the same or the next minute
    // bucket, so replicate each right event into (its bucket, bucket-1)
    // and equi-join on (user, bucket); the range check is residual
    val b = ev.withColumn("bucket",
      explode(array(expr("ms div 60000"), expr("ms div 60000 - 1"))))
    a.as("a").join(b.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          (col("b.ms") - col("a.ms")).between(0L, 60000L) &&
          (col("b.ms") > col("a.ms") ||
            (col("b.ms") === col("a.ms") && col("b.event_id") > col("a.event_id"))))
      .select(
        col("a.event_id").as("id_a"),
        col("b.event_id").as("id_b"),
        (col("b.ms") - col("a.ms")).as("gap_ms"))
      // pin before the presentation sort: the bucketed self-join probe
      // would otherwise run twice (range-sampler pass, guide §2.4)
      .transform(d => graft.ops.GlobalOrder.pinnedSort(
        d, col("id_a"), col("id_b")))
  }

  /**
   * Calendar-spine join: generate every day of 1997 (dimension
   * generation via `sequence` + `explode` — no source table) and
   * left-join daily order counts, zero-filling empty days. The spine is
   * generated, tiny and broadcast; the fact side aggregates first.
   */
  def calendarSpine(spark: SparkSession, dir: String): DataFrame = {
    val spine = spark.range(1)
      .select(explode(expr(
        "sequence(to_date('1997-01-01'), to_date('1997-12-31'), interval 1 day)"))
        .as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
    val daily = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
      .orderBy("day")
  }

  /** Explicit GROUPING SETS — the ((status), (priority)) pair, which
    * neither ROLLUP nor CUBE produces alone. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** first/last/nth value window functions with explicit frames. */
  def valueWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distribution ranks: percent_rank / cume_dist / ntile, derived
    * from [[graft.ops.GlobalOrder.groupedRankAndPrefix]]'s per-key
    * rank and total instead of a `Window.partitionBy(c_nationkey)` —
    * the 25-key window would shuffle every customer into 25 reducer
    * tasks; the grouped form range-partitions on (nation, acctbal, …)
    * so parallelism never caps at key cardinality. The order is total
    * (custkey tiebreak), so rank has no peers and
    * `percent_rank = (rank−1)/(N_k−1)`, `cume_dist = rank/N_k` — the
    * same single divisions the window functions perform (exact
    * rational arithmetic — cross-engine deterministic). */
  def distributionRanks(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    graft.ops.GlobalOrder.groupedRankAndPrefix(c,
        keys = Seq(col("c_nationkey")),
        order = Seq(col("c_acctbal"), col("c_custkey")))
      .select(
        col("c_nationkey"), col("c_custkey"),
        when(col("g_total_rows") > 1L,
          (col("g_rank") - 1L).cast("double") /
            (col("g_total_rows") - 1L).cast("double"))
          .otherwise(0.0).as("pct_rank"),
        (col("g_rank").cast("double") / col("g_total_rows").cast("double"))
          .as("cume"),
        graft.ops.GlobalOrder.ntileFromRank(col("g_rank"), col("g_total_rows"), 4)
          .as("quartile"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** Conditional scalar expressions: nullif / coalesce / greatest /
    * least across columns. */
  def conditionalExprs(spark: SparkSession, dir: String): DataFrame =
    // pinnedSort: map-only scalar projection over the widest fact table
    // — unpinned, the presentation sort's range sampler evaluates the
    // whole projection twice (r17 optimization round)
    graft.ops.GlobalOrder.pinnedSort(
      Tables.lineitem(spark, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("kept")).as("flag_coalesced"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_quantity"), lit(10.0)).as("capped_qty")),
      col("l_orderkey"), col("l_linenumber"))

  /** Map/JSON-object functions: parse the dynamic properties envelope
    * into a map, expose its keys (the reference's config-driven
    * property projection, app/hs_contacts.py:164-169). */
  def mapFunctions(spark: SparkSession, dir: String): DataFrame =
    // pinnedSort: from_json over every envelope is the query's whole
    // cost — unpinned, the sort sampler parses everything twice
    graft.ops.GlobalOrder.pinnedSort(
      Tables.events(spark, dir)
        .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
        .select(
          col("event_id"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("prop_keys"),
          size(map_keys(col("m"))).cast("long").as("n_props"),
          element_at(col("m"), "k").cast("long").as("k_value")),
      col("event_id"))

  /** INTERSECT: customers in the BUILDING segment who also placed a
    * high-value order (set semantics, dedup included). */
  def intersectOp(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("custkey"))
    building.intersect(bigSpenders).orderBy("custkey")
  }

  /**
   * TPC-H Q5-style local supplier volume: revenue where the customer and
   * the line's supplier sit in the same nation — two dimension paths
   * meeting in a cross-table equality. Supplier/customer/nation/region
   * broadcast; the fact chain shuffles once on the orderkey.
   */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    // customer and supplier grow with scale — unhinted joins let AQE
    // broadcast while small and shuffle at 100×; nation stays hinted
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .filter(c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Value-based (RANGE) window frame: events in the preceding hour per
    * user at each event — frame bounds on the ms value, not row counts. */
  def rangeFrameWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("events_last_hour", count(lit(1)).over(w))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Ordered string aggregation: per-region sorted nation roster
    * (collect_list + array_sort ≡ string_agg ORDER BY). */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  /** Deterministic mode: most frequent order priority per status,
    * ties broken by priority string order (built-in `mode` leaves ties
    * unspecified — this formulation is exact in any engine). */
  def modeAgg(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
      .orderBy("o_orderstatus")
  }

  /**
   * Deterministic Pearson correlation from decimal-exact component sums
   * — `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²))` with every Σ
   * exact, so the handful of double ops at the end are identical in any
   * engine (built-in `corr` streams doubles and is order-dependent).
   */
  def correlation(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_discount").cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      .withColumn("corr_xy",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"), col("corr_xy"))
      .orderBy("l_returnflag")
  }

  /**
   * Deterministic variance/stddev: explicit `(Σx² − (Σx)²/n)/(n−1)` over
   * DECIMAL-exact component sums, so the result is identical in any
   * engine and any aggregation order — unlike built-in `var_samp`,
   * whose streaming double accumulation is order-dependent.
   */
  /**
   * TPC-H Q2-style correlated scalar subquery: for every part, the
   * supplier(s) whose shipped price equals the part's minimum (no
   * partsupp table in the fixture, so the correlation runs against
   * lineitem). Written in SQL ON PURPOSE: Catalyst's
   * RewriteCorrelatedScalarSubquery decorrelates the inner MIN into an
   * aggregate + join — the plan shape a 100 TB engine needs (one
   * grouped pass over lineitem, never a per-row re-scan).
   */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("g_part")
    Tables.supplier(spark, dir).createOrReplaceTempView("g_supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("g_nation")
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
        |       n.n_name, l.l_extendedprice AS min_price
        |FROM g_part p, g_supplier s, g_nation n, g_lineitem l
        |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
        |                           FROM g_lineitem l2
        |                           WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin)
  }

  /**
   * TPC-H Q20-style nested IN + correlated quantity threshold:
   * suppliers who shipped more than 15% of some part's total volume.
   * The inner correlated SUM decorrelates to a per-part aggregate
   * joined against the per-(part, supplier) aggregate; `20 * qty >
   * 3 * total` keeps the 15% comparison in exact decimals (no
   * division).
   */
  def dominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("g_supplier")
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT s.s_suppkey, s.s_name FROM g_supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT ps.l_suppkey FROM (
        |    SELECT l_partkey, l_suppkey,
        |           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |    FROM g_lineitem GROUP BY l_partkey, l_suppkey) ps
        |  WHERE 20 * ps.qty > 3 * (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |                      FROM g_lineitem l2
        |                      WHERE l2.l_partkey = ps.l_partkey))
        |ORDER BY s.s_suppkey""".stripMargin)
  }

  /**
   * TPC-H Q17-style "below one-fifth of the part's average quantity"
   * revenue. The classic form compares against `0.2 * AVG(...)` — a
   * double average whose partition fold order is not reproducible, so
   * the predicate is rearranged into exact-decimal cross-multiplication:
   * `5·qty·n < Σqty` ⇔ `qty < 0.2·avg`, making the result (and its
   * oracle) bit-exact. Two correlated scalars (COUNT and SUM) both
   * decorrelate into one grouped pass over lineitem.
   */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT l.l_returnflag,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS small_qty_revenue,
        |       COUNT(*) AS n_lines
        |FROM g_lineitem l
        |WHERE 5 * CAST(l.l_quantity AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM g_lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
        |       FROM g_lineitem l3 WHERE l3.l_partkey = l.l_partkey)
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin)
  }

  /**
   * Skew-mitigated fact⋈dim join: when one join key is hot enough to
   * straggle a shuffle join and the dim side is too big to broadcast,
   * salt the fact side with a DETERMINISTIC residue of a unique column
   * (never `rand()` — retries/replays must agree) and replicate the dim
   * side across the salt range. Each hot key's rows then spread over
   * `saltBuckets` reducers. Cost: `saltBuckets × |dim|` replication —
   * the knob trades dim duplication against reducer skew. Results are
   * identical to the plain join (the oracle IS the plain join).
   *
   * WHEN to use it (the `AqeSkewSpec`-measured decision rule, also in
   * SCALE.md): Spark 4 AQE's skew-join already splits hot partitions
   * of shuffled equi-joins at runtime — prefer the plain join there.
   * The manual salt earns its replication cost only when AQE is off,
   * or when the join's output partitioning must survive exactly for a
   * downstream stage (AQE skew splits forfeit it). Hot-key AGGREGATES
   * have no AQE rewrite at all — for those see the salted two-phase
   * aggregate (q49, `Relational2.saltedAgg`).
   */
  def saltedJoin(spark: SparkSession, dir: String, saltBuckets: Int = 8): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("salt", pmod(col("event_id"), lit(saltBuckets.toLong)))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt",
        explode(expr(s"sequence(0L, ${saltBuckets - 1}L)")))
    ev.join(cust,
        ev("user_id") === cust("c_custkey") && ev("salt") === cust("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /**
   * TPC-H Q22-style "idle rich customers": customers with an account
   * balance above the positive-balance average who never placed a
   * big-ticket order (every fixture customer has SOME order, so the
   * anti-condition carries a price predicate to keep the result
   * populated), grouped by nation. Exercises the remaining classic
   * subquery pair —
   * an uncorrelated scalar subquery (one global aggregate, evaluated
   * once and broadcast as a literal, never per-row) and a correlated
   * NOT EXISTS that Catalyst decorrelates to a LEFT ANTI join on
   * o_custkey. The average uses the exact decimal-sum/COUNT discipline
   * (a plain double AVG is fold-order-dependent, so a threshold
   * comparison on it could flip rows between engines).
   */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("g_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    Tables.nation(spark, dir).createOrReplaceTempView("g_nation")
    spark.sql(
      """SELECT n.n_name, COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM g_customer c JOIN g_nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
        |                                AS DOUBLE) / COUNT(*)
        |                     FROM g_customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM g_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000.0)
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  def varianceStats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(x * x).cast("double").as("sum_x2"))
      .withColumn("variance",
        (col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / (col("n") - 1))
      .withColumn("stddev", sqrt(col("variance")))
      .select(col("l_returnflag"), col("n"), col("sum_x"), col("variance"), col("stddev"))
      .orderBy("l_returnflag")
  }
}
