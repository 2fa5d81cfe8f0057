package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class Relational2Spec extends SparkSpec {

  test("sessionization covers every event exactly once, sessions gap > 30min") {
    val s = Relational2.sessionize(spark, sf).cache()
    val total = s.agg(sum("n_events")).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // session ids start at 1 and are contiguous per user
    val perUser = s.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"),
        countDistinct("session_id").as("n"))
    assert(perUser.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    // sessions don't overlap: next start > previous end (by construction gap>30m)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val overlaps = s.withColumn("prev_end", lag("end_ms", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_ms") - col("prev_end") <= 1800000L)
    assert(overlaps.count() == 0)
  }

  test("as-of join matches each event to the user's latest preceding order") {
    val res = Relational2.asofJoin(spark, sf).cache()
    // every matched order is at or before the event and belongs to the user
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("last_orderkey"),
        col("o_custkey"), Tables.epochMs(col("o_orderdate")).as("ots"))
    val joined = res.join(o, "last_orderkey")
    assert(joined.filter(col("o_custkey") =!= col("user_id")).count() == 0)
    assert(joined.filter(col("ots") > col("ts_ms")).count() == 0)
    // spot-check one event against a driver-side computation
    val ev0 = res.head
    val (eid, uid, ets) = (ev0.getLong(0), ev0.getLong(1), ev0.getLong(2))
    val expected = Tables.orders(spark, sf)
      .filter(col("o_custkey") === uid &&
        Tables.epochMs(col("o_orderdate")) <= ets)
      .orderBy(Tables.epochMs(col("o_orderdate")).desc, col("o_orderkey").desc)
      .head.getLong(0)
    assert(ev0.getLong(3) == expected, s"event $eid matched wrong order")
  }

  test("pivot row sums equal per-user event counts") {
    val p = Relational2.pivotCounts(spark, sf)
    val rowSum = p.withColumn("total",
      col("n_click") + col("n_error") + col("n_purchase") + col("n_signup") + col("n_view"))
    val direct = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("n"))
    val bad = rowSum.join(direct, "user_id").filter(col("total") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("cube contains all four grouping sets consistently") {
    val cb = Relational2.cubeAgg(spark, sf).cache()
    val grand = cb.filter(col("status") === "ALL" && col("priority") === "ALL")
    assert(grand.count() == 1)
    assert(grand.head.getLong(2) == Tables.orders(spark, sf).count())
    val statusTotals = cb.filter(col("status") =!= "ALL" && col("priority") === "ALL")
      .agg(sum("n")).head.getLong(0)
    assert(statusTotals == Tables.orders(spark, sf).count())
  }

  test("outer join keeps customers with zero orders") {
    val oj = Relational2.outerJoinAgg(spark, sf)
    assert(oj.count() == Tables.customer(spark, sf).count())
    assert(oj.filter(col("n_orders") === 0 && col("total_spend") =!= 0.0).count() == 0)
  }

  test("percentiles are ordered p25 <= p50 <= p75 <= p95") {
    val p = Relational2.percentiles(spark, sf)
    assert(p.filter(col("p25") > col("p50") || col("p50") > col("p75") ||
      col("p75") > col("p95")).count() == 0)
  }

  test("histogram bins partition all rows") {
    val h = Relational2.histogram(spark, sf)
    assert(h.agg(sum("n")).head.getLong(0) == Tables.lineitem(spark, sf).count())
  }

  test("salted two-phase agg equals the direct group-by") {
    val salted = Relational2.saltedAgg(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect()
    assert(salted.sameElements(direct))
  }

  test("approx sketches land within tolerance of exact values") {
    val sk = Relational2.approxSketches(spark, sf).collect()
    assert(sk.nonEmpty)
    sk.foreach { r =>
      assert(r.getBoolean(3), s"HLL out of 5% envelope for ${r.getString(0)}")
      assert(r.getBoolean(4), s"approx median outside [p45, p55] for ${r.getString(0)}")
    }
  }

  test("keyset page: 100 rows strictly after the cursor, ordered") {
    val pg = Relational2.keysetPage(spark, sf).collect()
    assert(pg.length == 100)
    assert(pg.forall(_.getLong(0) > 200L))
    assert(pg.map(_.getLong(0)).toSeq == pg.map(_.getLong(0)).sorted.toSeq)
  }
}
