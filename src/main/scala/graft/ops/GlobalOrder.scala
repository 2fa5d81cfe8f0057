package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Distributed global ranking and prefix sums — the scale-safe
 * replacement for a partition-less window (`Window.orderBy(...)`
 * without `partitionBy`), which Spark executes by moving EVERY row
 * into one task: correct at test SF, a single-executor bottleneck at
 * 100 TB.
 *
 * The classic two-phase formulation instead:
 *  1. range-repartition on the TOTAL order (the same exchange a global
 *     sort plans) and sort within partitions; one `mapPartitions` pass
 *     assigns each row its LOCAL rank and exclusive running sum — all
 *     partitions work in parallel, and no second exchange is needed
 *     (a `Window.partitionBy(pid)` here would re-shuffle everything on
 *     pid; the imperative per-partition pass is exactly the
 *     "genuine per-partition logic" tier);
 *  2. per-partition row/value totals (a map-side partial aggregate —
 *     ONE row per partition crosses the wire) fold into exclusive
 *     offsets, broadcast back, and compose: global rank = partition
 *     offset + local rank, global prefix = value offset + local sum.
 *
 * The ranged-and-sorted data is materialized ONCE (`localCheckpoint`)
 * and both phases read it: this is load-bearing, not an optimization —
 * Spark's range partitioner SAMPLES its bounds per exchange instance,
 * so two independent executions of the "same" repartitionByRange can
 * place boundary rows in different partitions, and phase-2 offsets
 * would then disagree with phase-1 pids (observed: duplicate ranks).
 * Pinning the blocks makes partition ids a fact, not a plan. Cost:
 * one full shuffle plus one local write — the same I/O class as any
 * global ORDER BY with spill.
 *
 * Correctness is LAYOUT-INDEPENDENT: wherever the range sampler drops
 * partition bounds, every key in partition p sorts before every key in
 * p+1 and the within-partition order is total, so the composed rank is
 * the unique global rank. Callers MUST pass a total order (include a
 * unique tiebreak column) — with duplicate sort keys a range boundary
 * could split ties arbitrarily, the same caveat as every other ordered
 * operator in this repo.
 */
object GlobalOrder {

  /**
   * Adds to `df`:
   *  - `rankCol`: the 1-based global rank under `order` (LongType);
   *  - `prefixCol` (if `value` is set): the global EXCLUSIVE prefix sum
   *    of `value` under `order` — the sum over all strictly-preceding
   *    rows (0 for the first row). `value` must be integral (it is
   *    summed as Long, keeping prefixes exact — the repo's integer
   *    discipline; widen doubles yourself via a scaled decimal if ever
   *    needed);
   *  - `totalRowsCol`: total row count N in every row (the offset fold
   *    has it for free, and ntile-style bucketing needs it).
   */
  def withRankAndPrefix(
      df: DataFrame,
      order: Seq[Column],
      value: Option[Column] = None,
      rankCol: String = "g_rank",
      prefixCol: String = "g_prefix",
      totalRowsCol: String = "g_total_rows"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df
      .withColumn("__v", value.getOrElse(lit(0L)).cast("long"))
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    // phase-1 local pass: rank + exclusive running sum, no exchange
    val vIdx = sorted.schema.fieldIndex("__v")
    val outSchema = sorted.schema
      .add("__pid", LongType, nullable = false)
      .add("__lrank", LongType, nullable = false)
      .add("__lsum", LongType, nullable = false)
    val local = sorted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var rank = 0L
      var cum = 0L
      rows.map { r =>
        rank += 1
        val before = cum
        if (!r.isNullAt(vIdx)) cum += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ pid :+ rank :+ before)
      }
    }(Encoders.row(outSchema))
    // phase-2 offsets: one partial-aggregated row per partition, read
    // from the SAME pinned blocks as phase 1
    val offsets = sorted
      .withColumn("__pid", spark_partition_id().cast("long"))
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    // exclusive offsets over the partitions-bound table — this window
    // IS one-task, over ≤ `parts` rows, which is the point
    val ow = Window.orderBy(col("__pid"))
    val folded = offsets
      .withColumn("__rank_off",
        coalesce(sum(col("__n")).over(ow.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__sum_off",
        coalesce(sum(col("__s")).over(ow.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(totalRowsCol, sum(col("__n")).over(
        ow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__rank_off"), col("__sum_off"), col(totalRowsCol))
    val joined = local.join(broadcast(folded), Seq("__pid"))
      .withColumn(rankCol, col("__rank_off") + col("__lrank"))
    val withPrefix = value match {
      case Some(_) => joined.withColumn(prefixCol, col("__sum_off") + col("__lsum"))
      case None => joined
    }
    withPrefix.drop("__pid", "__v", "__lrank", "__lsum", "__rank_off", "__sum_off")
  }

  /** Integer floor division of non-negative long columns. Spark's `/`
    * on Columns is double division, so divide only after subtracting
    * the remainder — the quotient is then exactly representable and the
    * cast is lossless. */
  private def idiv(a: Column, b: Column): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    ((al - pmod(al, bl)) / bl).cast("long")
  }

  /** ANSI ntile bucket (1-based) from a global rank: the first
    * `N mod k` buckets carry `N div k + 1` rows, the rest `N div k` —
    * exactly DuckDB/Spark `ntile(k)` semantics, computed from
    * [[withRankAndPrefix]]'s rank instead of a one-task window. */
  def ntileFromRank(rank: Column, totalRows: Column, k: Int): Column = {
    val n = totalRows.cast("long")
    val size = idiv(n, lit(k.toLong))
    val rem = pmod(n, lit(k.toLong))
    val cut = rem * (size + 1L)
    when(rank <= cut, idiv(rank - 1L, size + 1L) + 1L)
      .otherwise(rem + idiv(rank - cut - 1L, size) + 1L)
  }
}
