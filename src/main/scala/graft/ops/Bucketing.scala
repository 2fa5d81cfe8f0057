package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed-table co-location: the storage-level answer to the shuffle
 * that otherwise dominates every big fact⋈fact join.
 *
 * A 100 TB orders⋈lineitem join shuffles BOTH fact tables on the join
 * key every time it runs. Bucketing pays that shuffle ONCE at write
 * time: both tables hash-partitioned into the same number of buckets on
 * their join keys, each bucket sorted. Every subsequent join (and any
 * aggregation keyed on the same column) then reads co-located buckets
 * with NO exchange at all — the scan's `outputPartitioning` is already
 * the `HashPartitioning` the join requires, and with one file per
 * bucket the sort disappears too. [[graft.plans.PlanChecks]]-style spec
 * coverage asserts the exchange-free plan mechanically
 * (`BucketingSpec`).
 *
 * This is the engine's co-location contract for repeated pipelines
 * (the reference's nightly polling analogue: ingest once, query many):
 * land fact tables with [[writeBucketed]], point the recurring queries
 * at the tables, and the per-run shuffle cost drops to zero.
 */
object Bucketing {

  /**
   * Persist `df` as a managed parquet table bucketed AND sorted on
   * `key`. The pre-repartition on the bucket key with `buckets`
   * partitions makes each write task own exactly one bucket, so every
   * bucket lands as ONE file — the layout Spark needs to also elide
   * the sort-merge sort (many files per bucket keep the join
   * exchange-free but re-sort per bucket).
   */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /**
   * Per-order revenue over co-bucketed orders/lineitem tables: a
   * fact⋈fact equi-join plus a join-key aggregation, the shape whose
   * plan must contain ZERO exchanges when both tables are bucketed on
   * the join key — scan → (sorted) merge join → partial+final agg, all
   * inside the bucket partitioning.
   */
  def bucketedOrderRevenue(spark: SparkSession,
      ordersTable: String, lineitemTable: String): DataFrame = {
    val o = spark.table(ordersTable)
    val l = spark.table(lineitemTable)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }
}
