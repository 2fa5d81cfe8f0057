package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * MERGE INTO semantics as a plain relational plan — the warehouse
 * upsert (SCD1) the reference's polled change feed ultimately needs
 * applied to its snapshot (the reference only ever emitted the raw
 * feed; reference app/hs_contacts.py:121).
 *
 * Shape: survivors = snapshot ANTI-JOIN change keys; next snapshot =
 * survivors ∪ upserts. Both passes shuffle on the merge key once — at
 * 100 TB the anti join is the whole cost, and on a bucketed/
 * co-located snapshot (BucketingSpec's layout) it runs exchange-free;
 * the change batch is typically AQE-broadcast. No row ever needs a
 * full-outer join or a per-row lookup.
 */
object MergeOps {

  /**
   * Apply a change batch to a key-unique snapshot. `changes` carries
   * (key, op, payload...): op = "U" upserts the payload row (insert or
   * replace), op = "D" deletes the key. Changes must be key-unique —
   * the caller collapses multi-change batches first (latest-wins),
   * which is one `TopK.perKey` pass.
   */
  def upsert(snapshot: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val survivors = snapshot.join(changes.select(col(key)), Seq(key), "left_anti")
    survivors.unionByName(
      changes.filter(col("op") === "U").drop("op"))
  }

  /**
   * q120: the customer snapshot refreshed by a deterministic change
   * batch — every 7th customer's balance restated (+100), every 11th
   * customer (that isn't also restated) deleted. The oracle recomputes
   * the merged state with CASE/filter logic; row-for-row hash equality
   * proves insert, update and delete semantics all landed.
   */
  def customerUpsert(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val updates = c.filter(pmod(col("c_custkey"), lit(7L)) === 0L)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .withColumn("op", lit("U"))
    val deletes = c.filter(pmod(col("c_custkey"), lit(11L)) === 0L &&
        pmod(col("c_custkey"), lit(7L)) =!= 0L)
      .withColumn("op", lit("D"))
    val changes = updates.unionByName(deletes)
    upsert(c, changes, "c_custkey")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }
}
