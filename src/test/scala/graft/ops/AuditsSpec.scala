package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class AuditsSpec extends SparkSpec {

  test("k-anonymity: monotone in k, rows bounded, ppm exact") {
    val rows = Audits.kAnonymity(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L))
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) == total, "n_rows is the full event count")
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) == 1000000L * r.getLong(4) / r.getLong(2))
    }
    // a larger k can only flag MORE classes and rows
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3) && a.getLong(4) <= b.getLong(4))
    }
    // class sizes recomputed directly: violating rows for k=2 are the
    // singleton classes
    val singletons = Tables.events(spark, sf)
      .select(col("event_type"), Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .groupBy(col("event_type"), col("day"), col("band"))
      .agg(count(lit(1)).as("n")).filter(col("n") === 1).count()
    assert(rows.head.getLong(4) == singletons)
  }
}
