package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Batch re-expression of the reference's query surface (SURVEY.md §2):
 * the predicates / projections / limits / windows the reference pushes
 * into its remote scan, generalized over the `events` fixture.
 *
 * Reference semantics covered here:
 *  - S2 pushed range predicate on last-modified time
 *    (reference app/hs_contacts.py:64-70)
 *  - S3 pushed existence (non-null) predicate (app/hs_contacts.py:71-74)
 *  - S4 column projection pushdown (app/hs_contacts.py:78)
 *  - S5 limit (app/hs_contacts.py:80,101)
 *  - S6 positional text-table parse (app/app.py:11-28)
 *  - W1 tumbling processing-time windows (app/hs_contacts.py:40-48)
 *  - W6 per-entity fan-out (app/hs_engagements.py:162-179)
 *  - envelope JSON property extraction (app/hs_contacts.py:121)
 *
 * All are plain DataFrame compositions: Catalyst pushes the filters and
 * projections into the parquet scan (visible as PushedFilters/ReadSchema
 * in `.explain("formatted")`), so at 100 TB the scan only reads the
 * row groups and columns the query touches.
 */
object ReferenceOps {

  /** Fixed [lo, hi) window in epoch ms used by the deterministic batch
    * queries: 2024-01-05 .. 2024-01-20 UTC, inside the events range. */
  val WindowLoMs: Long = 1704412800000L // 2024-01-05T00:00:00Z
  val WindowHiMs: Long = 1705708800000L // 2024-01-20T00:00:00Z

  /**
   * Flagship: incremental change-feed scan — the reference's whole query
   * (S2 range + S3 existence + S4 projection + S5 limit) as one batch
   * plan. `ts` is emitted as epoch ms (`ts_ms`) for engine-agnostic
   * comparison.
   */
  def incrementalScan(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(Tables.epochMs(col("ts")).between(lit(WindowLoMs), lit(WindowHiMs - 1)))
      .filter(col("props").isNotNull)
      .select(
        col("event_id"),
        Tables.epochMs(col("ts")).as("ts_ms"),
        col("user_id"),
        col("event_type"),
        col("value"))
      .orderBy("event_id")
      .limit(500)
  }

  /** S4/S2: two-column projection + range filter on lineitem — the plan
    * must show parquet ReadSchema with exactly the used columns. */
  def projectionPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 30.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** S3: existence predicate + equality, projection. */
  def existenceFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("props").isNotNull && col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")

  /** S5 + sort: global top-k (Spark plans TakeOrderedAndProject — no
    * full sort materialization, scales as k per partition + merge). */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(50)

  /**
   * W1: tumbling 10-minute windows over event time, as a batch GROUP BY
   * on the ms-floored bucket. Bucket arithmetic is pure BIGINT
   * (`ms - ms % 600000`), identical in any engine. Aggregates avoid
   * float-order sensitivity: counts are exact; the value sum runs over
   * DECIMAL(18,2) and is cast back to double at the end.
   */
  def tumblingWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val ms = Tables.epochMs(col("ts"))
    Tables.events(spark, dir)
      .withColumn("bucket_ms", ms - pmod(ms, lit(600000L)))
      .groupBy(col("bucket_ms"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("bucket_ms"), col("event_type"))
  }

  /**
   * Sliding (overlapping) windows via Spark's native `window(ts, len,
   * slide)`: 10-minute windows every 5 minutes — each event lands in
   * exactly two. The oracle replays the window-assignment arithmetic
   * (grid-aligned starts g with g ≤ ts < g+len), proving the native
   * operator's semantics.
   */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        Tables.epochMs(col("window.start")).as("win_start_ms"),
        col("event_type"), col("n_events"))
      .orderBy(col("win_start_ms"), col("event_type"))

  /**
   * Native session windows (`session_window(ts, gap)`) per user — the
   * built-in counterpart of the manual lag/prefix-sum sessionization
   * (q27). Spark's session end = last event + gap, so the oracle (which
   * computes last-event ends) compares on `end − gap`.
   */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        Tables.epochMs(col("session_window.start")).as("start_ms"),
        (Tables.epochMs(col("session_window.end")) - lit(1800000L)).as("end_ms"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_ms"))

  /** W6: per-entity fan-out as a group-by over the entity key — at scale
    * this is one shuffle with map-side partial aggregation, not N
    * processes. */
  def entityFanout(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(Tables.epochMs(col("ts"))).as("first_ms"),
        max(Tables.epochMs(col("ts"))).as("last_ms"))
      .orderBy(col("event_type"))

  /**
   * S6: positional parse of a whitespace-separated text table (the
   * reference parses `ps -A` output positionally, app/app.py:22-27).
   * Here: first/second token + token count of each document.
   */
  def textScanParse(spark: SparkSession, dir: String): DataFrame =
    // pin before the presentation sort (map-only; guide §2.4)
    graft.ops.GlobalOrder.pinnedSort(
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          element_at(split(col("text"), " "), 1).as("tok1"),
          element_at(split(col("text"), " "), 2).as("tok2"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
      col("doc_id"))

  /** Envelope JSON extraction: pull the dynamic property `k` out of the
    * `props` JSON string (the reference's dynamic `properties` map). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    // pinnedSort: map-only JSON parse — unpinned, the presentation
    // sort's range sampler re-parses every props payload a second time
    graft.ops.GlobalOrder.pinnedSort(
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull),
      col("event_id"))

  /** JSON property aggregated: distribution of the `k` property by
    * event type. */
  def jsonPropertyStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
      .orderBy("event_type")
}
