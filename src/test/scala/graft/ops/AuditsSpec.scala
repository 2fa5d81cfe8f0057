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

  /** Events-shaped frame for the degenerate-input tests. */
  private def eventsFrame(rows: Seq[(String, java.sql.Timestamp, Double)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)), 1), schema)
  }

  test("empty events: all three audits return NULL ppm, never an error") {
    // ADVICE r12: `div 0`/`// 0` diverge across engines; nullif makes
    // the degenerate case NULL in both. An empty input must yield the
    // |thresholds| rows with zeroed class counts and null ratios.
    val empty = eventsFrame(Seq.empty)
    Seq(
      Audits.kAnonymityOf(empty),
      Audits.lDiversityOf(empty),
      Audits.tClosenessOf(empty)).foreach { df =>
      val rows = df.collect()
      assert(rows.length == 3)
      rows.foreach { r =>
        assert(r.getLong(1) == 0L, "n_classes must be 0")
        assert(r.isNullAt(5), s"risk_ppm must be NULL on empty input: $r")
      }
    }
  }

  test("t-closeness headroom guard fails LOUDLY past the decimal ceiling") {
    // real data can't reach 7e15 rows in a spec; inject a 1-row ceiling
    // and assert the raise_error branch fires instead of silent wrap
    val ev = eventsFrame(Seq(
      ("click", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("view", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0)))
    val ex = intercept[Exception] {
      Audits.tClosenessOf(ev, maxRows = 1L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("DECIMAL(38,0) headroom")),
      s"expected the loud headroom error, got: $ex")
  }

  test("t-closeness decimal lanes: values unchanged vs the long algebra on small data") {
    // the decimal promotion must be a pure widening — on inputs where
    // BIGINT was already exact the results are bit-identical
    val ev = eventsFrame(Seq(
      ("click", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("click", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 10.0),
      ("view", java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 10.0),
      ("view", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 10.0),
      ("buy", java.sql.Timestamp.valueOf("2024-01-02 01:00:00"), 250.0)))
    val rows = Audits.tClosenessOf(ev).collect()
    assert(rows.length == 3)
    // brute force: day1 band0 = {click:2, view:1}, day2 band0 = {view:1},
    // day2 band2 = {buy:1}; N=5, n_e = {click:2, view:2, buy:1}
    def tv(ce: Map[String, Long], nc: Long): Long = {
      val ge = Map("click" -> 2L, "view" -> 2L, "buy" -> 1L)
      val num = ge.map { case (e, neTot) =>
        math.abs(ce.getOrElse(e, 0L) * 5L - neTot * nc) }.sum
      1000000L * num / (2L * nc * 5L)
    }
    val tvs = Seq(
      (tv(Map("click" -> 2L, "view" -> 1L), 3L), 3L),
      (tv(Map("view" -> 1L), 1L), 1L),
      (tv(Map("buy" -> 1L), 1L), 1L))
    rows.foreach { r =>
      val t = r.getLong(0)
      val viol = tvs.filter(_._1 > t)
      assert(r.getLong(3) == viol.size.toLong, s"classes at t=$t: $r")
      assert(r.getLong(4) == viol.map(_._2).sum, s"rows at t=$t: $r")
    }
  }
}
