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

  test("funnel stages are strictly ordered and monotonically shrinking") {
    val r = Relational4.conversionFunnelBatch(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("t_click").isNotNull &&
      col("t_click") <= col("t_view")).count() == 0)
    assert(r.filter(col("t_purchase").isNotNull &&
      col("t_purchase") <= col("t_click")).count() == 0)
    // completing a later stage implies the earlier one
    assert(r.filter(col("t_purchase").isNotNull &&
      col("t_click").isNull).count() == 0)
    val nView = r.count()
    val nClick = r.filter(col("t_click").isNotNull).count()
    val nBuy = r.filter(col("t_purchase").isNotNull).count()
    assert(nView >= nClick && nClick >= nBuy)
  }

  test("retention cohorts: offset 0 is the full cohort, retention <= 1") {
    val r = Relational4.retentionCohorts(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("offset") === 0 &&
      col("n_active") =!= col("cohort_size")).count() == 0)
    assert(r.filter(col("retention") > 1.0 || col("retention") <= 0.0).count() == 0)
    assert(r.filter(col("offset") < 0).count() == 0)
  }

  test("unpivot melts 3 metrics per flag and preserves the wide values") {
    val r = Relational4.unpivotMetrics(spark, sf).cache()
    val flags = r.select("l_returnflag").distinct().count()
    assert(r.count() == flags * 3)
    // the melted sum_qty equals the directly-aggregated decimal sum
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("want"))
    val melted = r.filter(col("metric") === "sum_qty")
      .select(col("l_returnflag"), col("val"))
    assert(melted.join(direct, "l_returnflag")
      .filter(col("val") =!= col("want")).count() == 0)
  }

  test("transition matrix rows are per-from normalized and complete") {
    val r = Relational4.transitionMatrix(spark, sf).cache()
    assert(r.count() > 0)
    // each from-type's probabilities sum to 1 and counts to n_from
    val sums = r.groupBy("event_type")
      .agg(sum("p").as("psum"), sum("n").as("nsum"), max("n_from").as("nf"))
    assert(sums.filter(abs(col("psum") - 1.0) > 1e-9).count() == 0)
    assert(sums.filter(col("nsum") =!= col("nf")).count() == 0)
    // total transitions = total events minus one per active user
    val e = Tables.events(spark, sf)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(r.agg(sum("n")).head.getLong(0) == expected)
  }

  test("point-in-interval join covers every event exactly once, type-consistent") {
    val r = Relational4.pointInInterval(spark, sf).cache()
    assert(r.count() > 0)
    // the SCD2 theorem: every event falls in exactly one interval and
    // matches that interval's type — coverage_ok everywhere
    assert(r.filter(!col("coverage_ok")).count() == 0)
    // total matched events == total events
    val total = Tables.events(spark, sf).count()
    assert(r.agg(sum("n_matched")).head.getLong(0) == total)
  }

  test("incremental agg merge equals the direct recompute, bit for bit") {
    val merged = Relational4.incrementalAgg(spark, sf)
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(col("o_custkey"))
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("winsorize clips into [p05, p95] and counts the clipped tails") {
    val r = Relational4.winsorize(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("p05") > col("p95")).count() == 0)
    // exact-percentile tail bound: at most floor(0.05·(n−1)) + 1 rows
    // can sit strictly outside an interpolated p05/p95
    val tailMax = expr("(5 * (n - 1)) div 100 + 1")
    assert(r.filter(col("n_clipped_low") > tailMax).count() == 0)
    assert(r.filter(col("n_clipped_high") > tailMax).count() == 0)
    // winsorized mean sits inside the clip bounds
    val bad = r.filter(col("sum_winsorized") / col("n") < col("p05") ||
      col("sum_winsorized") / col("n") > col("p95"))
    assert(bad.count() == 0)
  }

  // the declarative reference plan for the fuzzy join: the naive
  // (brand, size) block — quadratic within blocks, so never the shipped
  // plan, but the ground truth the prefix-filtered plan must equal
  private def naiveFuzzy(parts: org.apache.spark.sql.DataFrame, maxDist: Int) =
    parts.as("a").join(parts.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.p_brand").as("p_brand"),
        col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
        col("dist").cast("long").as("dist"))

  test("fuzzy join: prefix-filtered blocking is LOSSLESS vs the naive block join") {
    // crafted corpus exercising every arm of the blocking scheme:
    // signature pairs, repeated grams (bag/occ encoding), length-band
    // edges, the degenerate-short fallback, the short/long boundary,
    // cross-brand/size non-pairs, and quote/backslash characters
    val sqlCtx = spark
    import sqlCtx.implicits._
    val parts = Seq(
      (1L, "Brand#1", 1, "chocolate"),
      (2L, "Brand#1", 1, "chocolatt"),
      (3L, "Brand#1", 1, "chxcolatt"),
      (4L, "Brand#1", 1, "completely different"),
      (5L, "Brand#1", 2, "chocolate"),  // other size: never a pair
      (6L, "Brand#2", 1, "chocolate"),  // other brand: never a pair
      (7L, "Brand#1", 1, "aaaaaaaaa"),
      (8L, "Brand#1", 1, "aaaaaaaab"),
      (9L, "Brand#1", 1, "aabaaaaaa"),
      (10L, "Brand#1", 1, "chocolates"),
      (11L, "Brand#1", 1, "chocolatess"),
      (12L, "Brand#1", 1, "abc"),
      (13L, "Brand#1", 1, "abd"),
      (14L, "Brand#1", 1, "ab"),
      (15L, "Brand#1", 1, "a"),         // shorter than a gram
      (16L, "Brand#1", 1, "abcde"),
      (17L, "Brand#1", 1, "abcdef"),
      (18L, "Brand#1", 1, "abcdefg"),
      (19L, "Brand#1", 1, "a'b\\c\"d-e"),
      (20L, "Brand#1", 1, "a'b\\c\"d-f")
    ).toDF("p_partkey", "p_brand", "p_size", "p_name")
    for (d <- 0 to 3) {
      val got = Relational4.fuzzyJoinOf(parts, d)
        .collect().map(_.toSeq).sortBy(_.toString)
      val want = naiveFuzzy(parts, d)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == want.toSeq, s"maxDist=$d")
      if (d >= 1) assert(got.nonEmpty, s"maxDist=$d found no pairs")
    }
  }

  test("fuzzy join on the fixture: equals naive, keys ordered, distances bounded") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    // d=12 routes EVERY fixture name (7-12 chars) down the degenerate-
    // short arm; d=2 routes everything through the signature arm —
    // both must equal the declarative reference
    for (d <- Seq(2, 12)) {
      val got = Relational4.fuzzyJoinOf(parts, d)
        .collect().map(_.toSeq).sortBy(_.toString)
      val want = naiveFuzzy(parts, d)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == want.toSeq, s"maxDist=$d")
    }
    val r = Relational4.fuzzyJoinOf(parts, 12).cache()
    assert(r.filter(col("dist") > 12 || col("dist") < 0).count() == 0)
    assert(r.filter(col("key_a") >= col("key_b")).count() == 0)
    // spot-check one pair's distance against a driver-side DP
    val row = r.head
    val nameOf = parts
      .filter(col("p_partkey").isin(row.getLong(1), row.getLong(2)))
      .select("p_partkey", "p_name").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    assert(lev(nameOf(row.getLong(1)), nameOf(row.getLong(2))) == row.getLong(3))
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
