package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Privacy / release-risk audits (q216): the pre-publication checks a
 * dataset release pipeline runs beside the quality audits (q124).
 */
object Audits {

  /** Re-identification thresholds reported by [[kAnonymity]]. */
  val KThresholds: Seq[Int] = Seq(2, 5, 10)

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
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val classes = ev.select(
        col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000")) // integer div, q126 idiom
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
            s"(1000000 * r$k) div n_rows AS risk_ppm, " +
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
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val classes = ev.select(
        col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000"))
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
            s"(1000000 * r$l) div n_rows AS risk_ppm, " +
            "n_classes, n_rows)").mkString(", ") + "))").as("s"))
      .select(col("s.l"), col("s.n_classes"), col("s.n_rows"),
        col("s.n_violating_classes"), col("s.n_violating_rows"),
        col("s.risk_ppm"))
      .orderBy(col("l"))
  }

  /** Distance thresholds (ppm of total-variation) reported by
    * [[tCloseness]]. */
  val TThresholds: Seq[Int] = Seq(100000, 200000, 300000)

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
   * broadcasts). BIGINT headroom: |n_ce·N| ≤ N², fine to ~3·10⁹ rows;
   * beyond that the same algebra runs on pre-scaled ppm counts.
   */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
        col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000"))
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
        sum(abs(col("n_ce") * col("n") - col("n_e") * col("n_c")))
          .as("dev_present"),
        sum(col("n_e")).as("ne_present"))
    val cls = c.join(dev, Seq("day", "band")).crossJoin(broadcast(tot))
      .withColumn("tv_ppm", expr(
        "(1000000 * (dev_present + n_c * (n - ne_present))) div (2 * n_c * n)"))
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
            s"(1000000 * r$i) div n_rows AS risk_ppm, " +
            "n_classes, n_rows)" }.mkString(", ") + "))").as("s"))
      .select(col("s.t"), col("s.n_classes"), col("s.n_rows"),
        col("s.n_violating_classes"), col("s.n_violating_rows"),
        col("s.risk_ppm"))
      .orderBy(col("t"))
  }
}
