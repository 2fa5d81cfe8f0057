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

  test("l-diversity: monotone in l, ppm exact, homogeneous classes recomputed") {
    val rows = Audits.lDiversity(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L, 5L))
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) == total, "n_rows is the full event count")
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) == 1000000L * r.getLong(4) / r.getLong(2))
    }
    // a larger l can only flag MORE classes and rows
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3) && a.getLong(4) <= b.getLong(4))
    }
    // l=2 violators are exactly the sensitive-homogeneous classes,
    // recomputed via an independent groupBy
    val homogeneous = Tables.events(spark, sf)
      .select(col("event_type"), Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .groupBy(col("day"), col("band"))
      .agg(countDistinct(col("event_type")).as("ndv"),
        count(lit(1)).as("n"))
      .filter(col("ndv") === 1)
    val Array(hc, hr) = homogeneous
      .agg(count(lit(1)), coalesce(sum(col("n")), lit(0L))).head match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    assert(rows.head.getLong(3) == hc && rows.head.getLong(4) == hr)
  }

  test("t-closeness: monotone in t, TV recomputed brute-force on the fixture") {
    val rows = Audits.tCloseness(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(100000L, 200000L, 300000L))
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) == total)
      assert(r.getLong(5) == 1000000L * r.getLong(4) / r.getLong(2))
    }
    // a LARGER t can only flag FEWER classes (opposite direction to
    // the k/l audits — t bounds the allowed distance)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) >= b.getLong(3) && a.getLong(4) >= b.getLong(4))
    }
    // brute-force recomputation of the exact TV algebra from raw rows
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), Tables.epochMs(col("ts")).as("ts_ms"),
        floor(col("value") / 100.0).cast("long").as("band"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .select("day", "band", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = raw.length.toLong
    val ge = raw.groupBy(_._3).map { case (e, rs) => e -> rs.length.toLong }
    val perT = scala.collection.mutable.Map(
      100000L -> (0L, 0L), 200000L -> (0L, 0L), 300000L -> (0L, 0L))
    raw.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      val nc = rs.length.toLong
      val ce = rs.groupBy(_._3).map { case (e, xs) => e -> xs.length.toLong }
      val tvNum = ge.map { case (e, neTot) =>
        math.abs(ce.getOrElse(e, 0L) * n - neTot * nc) }.sum
      val tvPpm = 1000000L * tvNum / (2L * nc * n)
      perT.keys.foreach { t =>
        if (tvPpm > t) {
          val (gc, gr) = perT(t); perT(t) = (gc + 1, gr + nc)
        }
      }
    }
    rows.foreach { r =>
      val (gc, gr) = perT(r.getLong(0))
      assert(r.getLong(3) == gc && r.getLong(4) == gr, r)
    }
  }
}
