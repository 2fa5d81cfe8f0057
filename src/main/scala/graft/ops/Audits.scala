package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Privacy / release-risk audits (q216): the pre-publication checks a
 * dataset release pipeline runs beside the quality audits (q124).
 *
 * Arithmetic discipline shared by all three audits: every ppm ratio
 * numerator runs in an exact DECIMAL(38,0) lane (DuckDB: HUGEINT) —
 * `1000000 * rows` overflows BIGINT past ~9.2e12 rows, which a 100 TB
 * event store reaches — and every divide guards its denominator with
 * `nullif(..., 0)` so a degenerate empty input yields NULL in BOTH
 * engines instead of a Spark-null-vs-DuckDB-error divergence.
 */
object Audits {

  /** Re-identification thresholds reported by [[kAnonymity]]. */
  val KThresholds: Seq[Int] = Seq(2, 5, 10)

  /** Shared QI projection: (event_type, activity day, value band). */
  private def qi(ev: DataFrame): DataFrame =
    ev.select(
        col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000")) // integer div, q126 idiom

  /** The ppm-share expression `(1e6 * num) div den` in an exact
    * DECIMAL(38,0) lane with a null-on-zero denominator — the one
    * spelling every audit output uses (oracle: HUGEINT + nullif). */
  private def ppmDiv(num: String, den: String): String =
    s"(1000000 * cast($num as decimal(38,0))) div nullif($den, 0)"

  /**
   * k-anonymity audit over the event stream: treat
   * (event_type, activity day, value band) as the quasi-identifier a
   * release would expose, and report — for k ∈ {2, 5, 10} — how many
   * QI equivalence classes have fewer than k members and what share of
   * ROWS sits in them (the re-identifiable sliver). A class of size 1
   * is a unique fingerprint; size < k means an attacker knowing the QI
   * narrows a subject to < k candidates.
   *
   * Scale shape: ONE hash aggregate builds the class-size table
   * (QI-cardinality, bounded by the band/day grid × event types, far
   * below row count), then a single group-less conditional-sum pass
   * computes every threshold at once, exploded into |K| literal rows
   * (the q165 ablation shape) — zero joins, nothing but the scan grows
   * with the data. All counts exact integers; the band is
   * floor(value/100) — same IEEE floor in both engines, no
   * truncation-vs-rounding cast trap.
   */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymityOf(Tables.events(spark, dir))

  private[graft] def kAnonymityOf(ev: DataFrame): DataFrame = {
    val classes = qi(ev)
      .groupBy(col("event_type"), col("day"), col("band"))
      .agg(count(lit(1)).as("n"))
    val aggs = Seq(
      count(lit(1)).as("n_classes"),
      sum(col("n")).as("n_rows")) ++
      KThresholds.flatMap(k => Seq(
        sum(when(col("n") < k, 1L).otherwise(0L)).as(s"g$k"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as(s"r$k")))
    val sums = classes.agg(aggs.head, aggs.tail: _*)
    sums.select(expr(
        "explode(array(" + KThresholds.map(k =>
          s"struct(CAST($k AS BIGINT) AS k, g$k AS n_violating_classes, " +
            s"r$k AS n_violating_rows, " +
            ppmDiv(s"r$k", "n_rows") + " AS risk_ppm, " +
            "n_classes, n_rows)").mkString(", ") + "))").as("s"))
      .select(col("s.k"), col("s.n_classes"), col("s.n_rows"),
        col("s.n_violating_classes"), col("s.n_violating_rows"),
        col("s.risk_ppm"))
      .orderBy(col("k"))
  }

  /** Diversity thresholds reported by [[lDiversity]]. */
  val LThresholds: Seq[Int] = Seq(2, 3, 5)

  /**
   * l-diversity audit — the attribute-disclosure check k-anonymity
   * misses: a QI class can hold >= k members who all share the SAME
   * sensitive value, so an attacker who locates the class learns the
   * attribute without identifying anyone. Here the released QI is
   * (activity day, value band) and the sensitive attribute is
   * event_type; for l in {2, 3, 5} the audit reports how many QI
   * classes carry fewer than l distinct sensitive values and the share
   * of ROWS inside them (the attribute-disclosure sliver).
   *
   * Scale shape: identical to [[kAnonymity]] — one hash aggregate to
   * the QI-cardinality class table (count + exact distinct over a
   * ~constant event-type alphabet), then a single group-less
   * conditional-sum pass exploded into |L| literal rows. Exact
   * integers end to end.
   */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    lDiversityOf(Tables.events(spark, dir))

  private[graft] def lDiversityOf(ev: DataFrame): DataFrame = {
    val classes = qi(ev)
      .groupBy(col("day"), col("band"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_type")).as("ndv"))
    val aggs = Seq(
      count(lit(1)).as("n_classes"),
      sum(col("n")).as("n_rows")) ++
      LThresholds.flatMap(l => Seq(
        sum(when(col("ndv") < l, 1L).otherwise(0L)).as(s"g$l"),
        sum(when(col("ndv") < l, col("n")).otherwise(0L)).as(s"r$l")))
    val sums = classes.agg(aggs.head, aggs.tail: _*)
    sums.select(expr(
        "explode(array(" + LThresholds.map(l =>
          s"struct(CAST($l AS BIGINT) AS l, g$l AS n_violating_classes, " +
            s"r$l AS n_violating_rows, " +
            ppmDiv(s"r$l", "n_rows") + " AS risk_ppm, " +
            "n_classes, n_rows)").mkString(", ") + "))").as("s"))
      .select(col("s.l"), col("s.n_classes"), col("s.n_rows"),
        col("s.n_violating_classes"), col("s.n_violating_rows"),
        col("s.risk_ppm"))
      .orderBy(col("l"))
  }

  /** Distance thresholds (ppm of total-variation) reported by
    * [[tCloseness]]. */
  val TThresholds: Seq[Int] = Seq(100000, 200000, 300000)

  /** Row-count ceiling for [[tCloseness]]'s DECIMAL(38,0) lanes: the
    * largest intermediate is 1e6 · dev_present ≤ 2e6 · N², which stays
    * under 10^38 while N < ~7e15. Past that the same algebra must run
    * on pre-scaled ppm counts; the in-plan guard below makes the switch
    * a loud error instead of silent precision loss. */
  val TClosenessMaxRows: Long = 7000000000000000L // 7e15

  /**
   * t-closeness audit — the distribution-skew check l-diversity
   * misses: a class can carry many DISTINCT sensitive values yet still
   * leak (90% one event type where the corpus has 12%). Per QI class
   * the audit computes the exact total-variation distance between the
   * class's event_type distribution and the corpus-wide one, in exact
   * integer arithmetic over the common denominator:
   * TV = Σ_e |n_ce·N − n_e·n_c| / (2·n_c·N), including the
   * event types ABSENT from the class (their deviation folds to
   * n_c·(N − Σ_{e present} n_e) — no dense class × alphabet join
   * needed). Reported per t ∈ {0.1, 0.2, 0.3} (ppm): classes whose TV
   * exceeds t, rows inside them, risk ppm.
   *
   * Scale shape: ONE corpus-scale hash aggregate to the
   * (class × alphabet)-cardinality table; everything after is
   * class-keyed (the per-event global table and the scalar total ride
   * broadcasts). Arithmetic headroom: dev_present can reach 2·n_c·N,
   * so the cross-multiplied products run in exact DECIMAL(38,0) lanes
   * (DuckDB: HUGEINT) — the q182 discipline — sound to
   * [[TClosenessMaxRows]] ≈ 7e15 rows, and the tv_ppm expression
   * raises a loud error (never wraps) past that ceiling.
   */
  def tCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessOf(Tables.events(spark, dir))

  private[graft] def tClosenessOf(events: DataFrame,
      maxRows: Long = TClosenessMaxRows): DataFrame = {
    val ev = qi(events)
    val ce = ev.groupBy(col("day"), col("band"), col("event_type"))
      .agg(count(lit(1)).as("n_ce"))
    val g = ce.groupBy(col("event_type")).agg(sum(col("n_ce")).as("n_e"))
    val tot = g.agg(sum(col("n_e")).as("n"))
    val c = ce.groupBy(col("day"), col("band")).agg(sum(col("n_ce")).as("n_c"))
    val dev = ce.join(broadcast(g), Seq("event_type"))
      .join(c, Seq("day", "band"))
      .crossJoin(broadcast(tot))
      .groupBy(col("day"), col("band"))
      .agg(
        // DECIMAL(38,0) lanes: n_ce·N ≤ N² wraps BIGINT past ~3e9 rows
        sum(abs(col("n_ce").cast("decimal(38,0)") * col("n") -
          col("n_e").cast("decimal(38,0)") * col("n_c"))).as("dev_present"),
        sum(col("n_e")).as("ne_present"))
    val cls = c.join(dev, Seq("day", "band")).crossJoin(broadcast(tot))
      .withColumn("tv_ppm",
        when(col("n") > maxRows,
          raise_error(lit("tCloseness: corpus rows exceed the " +
            "DECIMAL(38,0) headroom (~7e15); rerun on pre-scaled ppm counts"))
            .cast("long"))
        .otherwise(expr(
          "(1000000 * (dev_present + cast(n_c as decimal(38,0)) * (n - ne_present)))" +
            " div (2 * cast(n_c as decimal(38,0)) * n)")))
    val aggs = Seq(
      count(lit(1)).as("n_classes"),
      sum(col("n_c")).as("n_rows")) ++
      TThresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("tv_ppm") > t, 1L).otherwise(0L)).as(s"g$i"),
        sum(when(col("tv_ppm") > t, col("n_c")).otherwise(0L)).as(s"r$i")) }
    val sums = cls.agg(aggs.head, aggs.tail: _*)
    sums.select(expr(
        "explode(array(" + TThresholds.zipWithIndex.map { case (t, i) =>
          s"struct(CAST($t AS BIGINT) AS t, g$i AS n_violating_classes, " +
            s"r$i AS n_violating_rows, " +
            ppmDiv(s"r$i", "n_rows") + " AS risk_ppm, " +
            "n_classes, n_rows)" }.mkString(", ") + "))").as("s"))
      .select(col("s.t"), col("s.n_classes"), col("s.n_rows"),
        col("s.n_violating_classes"), col("s.n_violating_rows"),
        col("s.risk_ppm"))
      .orderBy(col("t"))
  }
}
