package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-LAYOUT operators: multi-dimensional clustering keys that decide
 * how 100 TB lands on disk. A table range-partitioned and sorted by a
 * Z-order (Morton) key over its two hottest filter columns serves
 * 2-D range predicates from a small fraction of its files — per-file
 * min/max stats stay tight on BOTH dimensions simultaneously, which a
 * lexicographic (a, b) sort only achieves for the leading column.
 * This is the layout trick behind Delta/Iceberg `ZORDER BY`; here it
 * is a plain Catalyst arithmetic expression, so the write path is
 * `df.repartitionByRange(zorderKey(...)).sortWithinPartitions(...)` —
 * no custom writer, and the key itself is deterministic integer math
 * (bit-exact in any engine, so the DuckDB oracle replays it).
 */
object Layout {

  /** Bits interleaved per dimension. 16+16 → a 32-bit Z-value. */
  val ZBits = 16

  /**
   * Morton interleave of the low [[ZBits]] bits of two non-negative
   * integral columns: bit i of `x` lands at Z-bit 2i, bit i of `y` at
   * 2i+1. Pure codegen'd arithmetic — 32 shift/mask/add terms, no UDF,
   * no join, no state — so it costs what a projection costs and the
   * optimizer can constant-fold / push it like any expression.
   */
  def zorderKey(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /**
   * Z-order layout AUDIT over lineitem's (l_partkey, l_suppkey) — the
   * two independent filter dimensions a parts-supply workload hits.
   * Rows are assigned their Z-value and grouped into the 4096 buckets
   * given by the top 12 Z-bits (what a range-partitioner would make
   * file boundaries); per bucket the audit reports row count and the
   * min/max of each dimension — the exact per-file stats a scan
   * planner would prune on. The Z-property under test: a bucket fixes
   * the high 6 bits of BOTH keys, so every bucket's span is ≤ 2^10 in
   * each dimension no matter how many rows it holds (a lexicographic
   * sort bounds only l_partkey's span; l_suppkey's stays full-range).
   *
   * Scale shape: one scan, row-local arithmetic, one aggregate keyed
   * on the 12-bit bucket — at 100 TB this is the cheap audit you run
   * AFTER a relayout to certify pruning effectiveness, and the same
   * key feeds `repartitionByRange` to produce that layout in the
   * first place.
   */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.model.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    li.withColumn("z", zorderKey(col("l_partkey"), col("l_suppkey")))
      .withColumn("bucket", shiftright(col("z"), 20))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("part_lo"),
        max(col("l_partkey")).as("part_hi"),
        min(col("l_suppkey")).as("supp_lo"),
        max(col("l_suppkey")).as("supp_hi"))
      .orderBy(col("bucket"))
  }

  /** The same Morton interleave as SQL text, for the DuckDB oracle —
    * generated from the SAME loop so the two cannot drift. */
  def zorderSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
