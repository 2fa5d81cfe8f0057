package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class ReferenceOpsSpec extends SparkSpec {

  test("incremental scan returns rows inside the window, props non-null") {
    val df = ReferenceOps.incrementalScan(spark, sf).cache()
    assert(df.count() > 0)
    val bad = df.filter(
      col("ts_ms") < ReferenceOps.WindowLoMs ||
        col("ts_ms") >= ReferenceOps.WindowHiMs).count()
    assert(bad == 0)
  }

  test("filter and projection are pushed into the parquet scan") {
    val plan = ReferenceOps.projectionPushdown(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,30.0)]"),
      s"no pushed filter in plan:\n$plan")
    assert(plan.contains("ReadSchema") &&
      !plan.contains("l_extendedprice"), "projection not pruned to used columns")
  }

  test("tumbling windows tile the timeline: every event in exactly one bucket") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val agg = ReferenceOps.tumblingWindowAgg(spark, sf)
    val total = agg.agg(sum("n_events")).head.getLong(0)
    assert(total == n, s"window agg covered $total of $n events")
    // bucket width is exact: bucket_ms is always a multiple of 600000
    assert(agg.filter(pmod(col("bucket_ms"), lit(600000L)) =!= 0).count() == 0)
  }

  test("entity fan-out partitions the stream: per-entity counts sum to total") {
    val ev = Tables.events(spark, sf)
    val fan = ReferenceOps.entityFanout(spark, sf)
    assert(fan.agg(sum("n_events")).head.getLong(0) == ev.count())
  }

  test("top-k uses TakeOrderedAndProject (no global sort)") {
    val plan = ReferenceOps.topK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("json extraction parses every non-null props row") {
    val ev = Tables.events(spark, sf)
    val extracted = ReferenceOps.jsonExtract(spark, sf).count()
    val withProps = ev.filter(col("props").isNotNull).count()
    assert(extracted == withProps)
  }
}
