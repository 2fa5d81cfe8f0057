package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class Relational4Spec extends SparkSpec {

  test("scd2 intervals: contiguous versions, no overlap, types change") {
    val r = Relational4.scd2Intervals(spark, sf).cache()
    assert(r.count() > 0)
    // versions are 1..n per user
    val v = r.groupBy("user_id")
      .agg(min("version").as("mn"), max("version").as("mx"),
        count(lit(1)).as("n"))
    assert(v.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    val w = Window.partitionBy("user_id").orderBy("version")
    val seq = r
      .withColumn("prev_to", lag("valid_to_ms", 1).over(w))
      .withColumn("prev_type", lag("event_type", 1).over(w))
    // each interval starts exactly one ms after the previous closes
    assert(seq.filter(col("prev_to").isNotNull &&
      col("valid_from_ms") =!= col("prev_to") + 1).count() == 0)
    // consecutive versions carry different types (that's what a version IS)
    assert(seq.filter(col("prev_type").isNotNull &&
      col("prev_type") === col("event_type")).count() == 0)
    // only the latest version is open-ended
    val opens = r.filter(col("valid_to_ms").isNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(opens.filter(col("n") =!= 1).count() == 0)
    assert(opens.count() == r.select("user_id").distinct().count())
  }

  test("window z-score flags exactly the |z| > 2.5 rows, from >=30-row frames") {
    val r = Relational4.windowZScore(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(abs(col("z")) <= 2.5).count() == 0)
    assert(r.filter(isnan(col("z"))).count() == 0)
    // spot-check one row against a driver-side recomputation
    val row = r.orderBy("event_id").head
    val (eid, etype, z) = (row.getLong(0), row.getString(1), row.getDouble(4))
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").cast("double").as("v"),
        Tables.epochMs(col("ts")).as("ts_ms"))
      .filter(col("event_type") === etype)
      .orderBy("ts_ms", "event_id")
      .collect()
    val i = ev.indexWhere(_.getLong(0) == eid)
    val frame = ev.slice(math.max(0, i - 100), i).map(_.getDouble(2))
    val mean = frame.sum / frame.length
    val variance = frame.map(x => (x - mean) * (x - mean)).sum / (frame.length - 1)
    val zExp = (ev(i).getDouble(2) - mean) / math.sqrt(variance)
    assert(math.abs(z - zExp) < 1e-6, s"z=$z expected ~$zExp")
  }
}
