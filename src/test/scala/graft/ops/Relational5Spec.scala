package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class Relational5Spec extends SparkSpec {

  test("streaks: consecutive-day islands partition each user's active days") {
    val r = Relational5.activityStreaks(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("longest_streak") < 1).count() == 0)
    // spot-check one user against a driver-side scan
    val row = r.head
    val uid = row.getLong(0)
    val days = Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(Tables.epochMs(col("ts")).as("ms"))
      .withColumn("day", expr("ms div 86400000"))
      .select("day").distinct().collect().map(_.getLong(0)).sorted
    val streaks = scala.collection.mutable.ListBuffer.empty[Long]
    var cur = 1L
    for (i <- 1 until days.length) {
      if (days(i) == days(i - 1) + 1) cur += 1
      else { streaks += cur; cur = 1L }
    }
    streaks += cur
    assert(streaks.max == row.getLong(1), s"user $uid")
    assert(streaks.length == row.getLong(2))
  }

  test("rolling actives: weekly distinct >= daily, first day equal") {
    val r = Relational5.rollingActives(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("rolling7_users") < col("dau")).count() == 0)
    val first = r.orderBy("day").head
    assert(first.getLong(1) == first.getLong(2),
      "first stream day has no prior week, rolling == dau")
  }

  test("region shares sum to one within every region") {
    val r = Relational5.regionShare(spark, sf).cache()
    val sums = r.groupBy("r_name").agg(sum("share").as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-9).count() == 0)
    assert(r.filter(col("share") <= 0.0 || col("share") > 1.0).count() == 0)
  }

  test("gap fill: contiguous spine, forward-filled from the latest observation") {
    import org.apache.spark.sql.expressions.Window
    val r = Relational5.gapFill(spark, sf).cache()
    assert(r.count() > 0)
    // spine is contiguous per user: row count == max - min + 1
    val span = r.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("day") - min("day") + 1).as("want"))
    assert(span.filter(col("n") =!= col("want")).count() == 0)
    // observed days keep their value; filled never null after the first
    // day (spines start at each user's first ACTIVE day)
    assert(r.filter(col("observed").isNotNull &&
      col("filled") =!= col("observed")).count() == 0)
    assert(r.filter(col("filled").isNull).count() == 0)
    // gap days carry the previous filled value forward
    val w = Window.partitionBy("user_id").orderBy("day")
    val gaps = r.withColumn("prev_filled", lag("filled", 1).over(w))
      .filter(col("observed").isNull)
    assert(gaps.filter(col("filled") =!= col("prev_filled")).count() == 0)
  }

  test("filtered aggregates agree with separately-filtered scans") {
    val r = Relational5.filteredAggs(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("n_filled") > col("n_orders") ||
      col("n_big") > col("n_orders")).count() == 0)
    val seg = r.head.getString(0)
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg && col("o_orderstatus") === "F")
      .count()
    assert(r.filter(col("c_mktsegment") === seg).head.getLong(2) == direct)
  }

  test("per-key approx distinct stays inside its 5% envelope") {
    val r = Relational5.approxDistinctPerKey(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(!col("approx_ok")).count() == 0)
  }

  test("weighted sample: correct ticket counts, stable draws, exactly k rows") {
    val r = Relational5.weightedSample(spark, sf).cache()
    assert(r.count() == 50)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), greatest(expr("n_chars div 100"), lit(1L)).as("want"))
    assert(r.join(docs, "doc_id").filter(col("tickets") =!= col("want")).count() == 0)
    // spot-check one doc's draw = min md5 over its tickets
    val row = r.head
    val (id, tickets, draw) = (row.getLong(0), row.getLong(2), row.getString(3))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (1L to tickets).map(t => md5hex(s"$id:$t")).min
    assert(draw == expect)
    // rerun-stable
    assert(Relational5.weightedSample(spark, sf).select("doc_id")
      .exceptAll(r.select("doc_id")).count() == 0)
  }

  test("regression slope matches a driver-side least squares") {
    val r = Relational5.regressionSlope(spark, sf).cache()
    assert(r.count() > 0)
    val row = r.head
    val (etype, slope, intercept) = (row.getString(0), row.getDouble(2), row.getDouble(3))
    val pts = Tables.events(spark, sf)
      .filter(col("event_type") === etype)
      .select(Tables.epochMs(col("ts")).as("ms"),
        col("value").cast("decimal(18,2)").cast("double").as("y"))
      .collect()
      .map(x => ((x.getLong(0) - 1704067200000L) / 1000L).toDouble -> x.getDouble(1))
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slopeExp = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - slopeExp) < 1e-9 * math.max(1.0, math.abs(slopeExp)))
    assert(math.abs(intercept - ((sy - slopeExp * sx) / n)) < 1e-6)
  }

  test("dq audit reports exact violations: orders clean, lineitem's dup keys found") {
    val r = Relational5.dataQualityAudit(spark, sf).cache()
    assert(r.count() == 2)
    val byTable = r.collect().map(x => x.getString(0) -> x).toMap
    assert(byTable("orders").getLong(1) == Tables.orders(spark, sf).count())
    assert(byTable("orders").getBoolean(6), "orders should pass every check")
    // the fixture's lineitem genuinely duplicates (orderkey, linenumber)
    // — the audit must surface it, with the exact count
    val li = Tables.lineitem(spark, sf)
    val dups = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(byTable("lineitem").getLong(2) == dups)
    assert(byTable("lineitem").getBoolean(6) == (dups == 0L))
    // FK integrity and ranges hold everywhere
    assert(r.filter(col("orphan_fk") =!= 0L || col("null_fk") =!= 0L ||
      col("range_viol") =!= 0L).count() == 0)
  }
}
