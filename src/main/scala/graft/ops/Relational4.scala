package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal-modeling operators over the event stream: slowly-changing-
 * dimension snapshots and windowed anomaly scoring — the shapes a
 * warehouse layer on top of the reference's polled CRM feed needs
 * (the reference emits raw change events, reference
 * app/hs_contacts.py:121; these operators turn that feed into
 * queryable history).
 */
object Relational4 {

  /**
   * SCD2 (type-2 slowly-changing-dimension) interval build: collapse
   * each user's event-type stream into versioned validity intervals —
   * one row per run of equal `event_type`, with `valid_from_ms` /
   * `valid_to_ms` (null = current) and a version number.
   *
   * Plan shape: both window functions (the change detector's lag and
   * the interval close's lead) share ONE partitioning on user_id, so
   * the whole operator is a single shuffle + two sorted window passes
   * — no self-join against "the next row", which is the O(N²)
   * formulation this replaces. Partitioning by the entity key is
   * exactly how it scales: 100 TB of events still means each user's
   * (small) history sits in one task.
   */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    val byUserChanges = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    e.withColumn("version", row_number().over(byUserChanges).cast("long"))
      .withColumn("valid_from_ms", col("ts_ms"))
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(byUserChanges) - 1L)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_ms"), col("valid_to_ms"))
      .orderBy(col("user_id"), col("version"))
  }

  /**
   * Trailing-window z-score anomaly detection: for each event, the
   * z-score of its value against the preceding 100 events of the same
   * type; emit the |z| > 2.5 anomalies.
   *
   * Parity discipline: mean and variance come from EXACT DECIMAL
   * window sums (Σv and Σv² over the same frame) — decimal addition is
   * associative, so the result is independent of Spark's intra-frame
   * evaluation order — and only the final mean/var/z expressions drop
   * to doubles, in a fixed operation order the oracle mirrors token
   * for token (identical-order double chains are bit-exact across
   * engines; accumulating doubles inside the window would not be).
   * One shuffle on event_type; the frame is a bounded 100-row buffer
   * per task regardless of total scale.
   */
  def windowZScore(spark: SparkSession, dir: String): DataFrame = {
    val frame = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(-100, -1)
    val v = col("value").cast("decimal(18,2)")
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("s1", sum(v).over(frame).cast("decimal(38,2)"))
      .withColumn("s2", sum(v * v).over(frame).cast("decimal(38,4)"))
      .filter(col("n") >= 30)
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("variance",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("n"))
          / (col("n") - 1))
      .filter(col("variance") > 0.0)
      .withColumn("z",
        (col("value").cast("decimal(18,2)").cast("double") - col("mean"))
          / sqrt(col("variance")))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"), col("ts_ms"),
        col("value"), col("z"))
      .orderBy(col("event_id"))
  }
}
