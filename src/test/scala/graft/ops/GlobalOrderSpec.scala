package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      col("l_quantity").cast("long").as("q"))

  test("distributed global rank equals the single-partition window rank") {
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val got = GlobalOrder.withRankAndPrefix(li, order, Some(col("q")))
      .select(col("l_orderkey"), col("l_linenumber"), col("g_rank"), col("g_prefix"))
      .orderBy(col("g_rank")).collect()
    val w = Window.orderBy(order: _*)
    val want = li
      .withColumn("g_rank", row_number().over(w).cast("long"))
      .withColumn("g_prefix", coalesce(
        sum(col("q")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("l_orderkey"), col("l_linenumber"), col("g_rank"), col("g_prefix"))
      .orderBy(col("g_rank")).collect()
    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("rank is invariant to input partitioning") {
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def run(parts: Int) =
      GlobalOrder.withRankAndPrefix(li.repartition(parts), order)
        .select(col("l_orderkey"), col("l_linenumber"), col("g_rank"))
        .orderBy(col("g_rank")).collect()
    assert(run(1).sameElements(run(13)))
  }

  test("ntileFromRank reproduces ANSI ntile semantics for awkward N/k") {
    // 6000 rows / 7 buckets: 6000 = 7*857 + 1 → first bucket one larger
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val got = GlobalOrder.withRankAndPrefix(li, order)
      .withColumn("b", GlobalOrder.ntileFromRank(col("g_rank"), col("g_total_rows"), 7))
      .groupBy("b").count().orderBy("b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val w = Window.orderBy(order: _*)
    val want = li.withColumn("b", ntile(7).over(w).cast("long"))
      .groupBy("b").count().orderBy("b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("no global window touches the big input; one tiny offset fold remains") {
    val df = GlobalOrder.withRankAndPrefix(li,
      Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
    df.collect()
    // AQE's rendering repeats nodes under "== Initial Plan ==" — audit
    // the final plan section only
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    // phase 1 is the imperative per-partition pass over the pinned
    // range-sorted blocks — not a window
    assert(plan.contains("MapPartitions"), s"expected mapPartitions pass:\n$plan")
    // exactly ONE window survives: the offset fold over the
    // partitions-bound table (≤ shuffle.partitions rows) — its input is
    // the per-partition aggregate, never the row data
    val windows = "Window \\[".r.findAllMatchIn(plan).length
    assert(windows == 1, s"expected exactly the tiny offset-fold window:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"offsets must come back as a broadcast:\n$plan")
  }
}
