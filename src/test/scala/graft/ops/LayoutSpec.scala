package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("morton key interleaves bits (hand-checked values)") {
    import spark.implicits._
    // (x, y) -> z: x bits at even positions, y bits at odd positions
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),
      (0L, 1L, 2L),
      (3L, 1L, 7L),     // x=0b11 -> bits 0,2 (5); y=0b1 -> bit 1 (2)
      (65535L, 0L, 0x55555555L),
      (0L, 65535L, 0xAAAAAAAAL),
      (65535L, 65535L, 0xFFFFFFFFL))
    val got = cases.toDF("x", "y", "want")
      .withColumn("z", Layout.zorderKey(col("x"), col("y")))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") == r.getAs[Long]("want"),
        s"morton(${r.getAs[Long]("x")}, ${r.getAs[Long]("y")})")
    }
  }

  test("z-order buckets bound BOTH dimensions' spans simultaneously") {
    // the span bound below holds only while keys fit in ZBits bits —
    // beyond that the Morton key aliases high bits (identically in
    // both engines; a relayout would scale inputs first). Cancel, not
    // fail, if a fixture regeneration ever widens the keys.
    val mx = Tables.lineitem(spark, sf)
      .agg(max("l_partkey"), max("l_suppkey")).head
    assume(mx.getLong(0) < 65536L && mx.getLong(1) < 65536L,
      s"fixture keys exceed ${Layout.ZBits} bits: $mx")
    val rows = Layout.zorderLayout(spark, sf).collect()
    assert(rows.nonEmpty)
    // a 12-bit bucket fixes the high 6 bits of each 16-bit dim, so
    // every bucket spans at most 2^10 in each dimension — the property
    // that makes per-file min/max stats prune 2-D range predicates
    rows.foreach { r =>
      assert(r.getAs[Long]("part_hi") - r.getAs[Long]("part_lo") <= 1023L, r)
      assert(r.getAs[Long]("supp_hi") - r.getAs[Long]("supp_lo") <= 1023L, r)
    }
    // conservation: every lineitem row lands in exactly one bucket
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  /** Reference xy2d (Wikipedia's iterative form) — the independent
    * implementation the Column walk is pinned against. */
  private def xy2d(n: Long, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbert key = reference xy2d, a continuous bijection (full 32x32 grid)") {
    import spark.implicits._
    val bits = 5
    val n = 1L << bits
    val grid = spark.range(n * n)
      .select(col("id").bitwiseAND(lit(n - 1)).as("x"),
        shiftright(col("id"), bits).as("y"))
    val rows = Layout.withHilbert(grid, col("x"), col("y"), "hd", bits)
      .select("x", "y", "hd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bit-exact vs the reference walk (any rotation bug breaks this)
    rows.foreach { case (x, y, d) =>
      assert(d == xy2d(n, x, y), s"hilbert($x, $y)")
    }
    // bijection onto 0 .. n^2-1
    assert(rows.map(_._3).sorted.toSeq == (0L until n * n).toSeq)
    // continuity: consecutive curve positions are grid-adjacent —
    // the property Morton order lacks and the locality claim rests on
    val byD = rows.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("hilbert buckets are exact 16x16 subsquares; rows conserved") {
    val rows = Layout.hilbertLayout(spark, sf).collect()
    assert(rows.nonEmpty)
    // a bucket = 256 = 4^4 consecutive curve cells = an aligned 16x16
    // subsquare, so BOTH masked spans are <= 15 — tighter than any
    // zone a lexicographic sort can promise on the trailing dimension
    rows.foreach { r =>
      assert(r.getAs[Long]("x_hi") - r.getAs[Long]("x_lo") <= 15L, r)
      assert(r.getAs[Long]("y_hi") - r.getAs[Long]("y_lo") <= 15L, r)
    }
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("bucket coarsening is exact: dropping 2k curve bits = the (B-k)-bit walk on the supercell") {
    // the theorem the grid pre-aggregation rests on, exhaustively over
    // the full 256x256 grid (B = 8, k = 2): the first B-k levels test
    // only bits >= 2^k, and the reflection s-1-x maps the low part to
    // its complement without borrowing into the high part
    val grid = spark.range(256L * 256L)
      .select(col("id").bitwiseAND(lit(255L)).as("x"),
        shiftright(col("id"), 8).as("y"))
    val both = Layout.withHilbert(grid, col("x"), col("y"), "hd", 8)
      .select(col("x"), col("y"), shiftright(col("hd"), 4).as("coarse"))
    val viaSuper = Layout.withHilbert(
      both.select(shiftright(col("x"), 2).as("cx"),
        shiftright(col("y"), 2).as("cy"), col("coarse")),
      col("cx"), col("cy"), "h6", 6)
    assert(viaSuper.filter(col("coarse") =!= col("h6")).count() == 0L)
  }

  test("square-grid zone derivation equals the direct per-row bucketing") {
    val base = Layout.maskedKeys(spark, sf)
    // the pre-rewrite formulation: key every ROW by the full 10-bit
    // walk, explode 3x, group by (layout, bucket) — kept here as the
    // semantic pin for the grid-pre-aggregated production shape
    val direct = {
      val keyed = Layout.withHilbert(base, col("x"), col("y"), "hd")
        .withColumn("zd", Layout.zorderKeyN(col("x"), col("y"), Layout.HBits))
        .withColumn("lexd", shiftleft(col("x"), Layout.HBits) + col("y"))
      keyed.select(col("x"), col("y"), explode(array(
          struct(lit("hilbert").as("layout"),
            shiftright(col("hd"), Layout.HBucketShift).as("bucket")),
          struct(lit("lex").as("layout"),
            shiftright(col("lexd"), Layout.HBucketShift).as("bucket")),
          struct(lit("zorder").as("layout"),
            shiftright(col("zd"), Layout.HBucketShift).as("bucket")))).as("lb"))
        .select(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"),
          col("x"), col("y"))
        .groupBy(col("layout"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("zx_lo"), max(col("x")).as("zx_hi"),
          min(col("y")).as("zy_lo"), max(col("y")).as("zy_hi"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Layout.zoneStats(base)) == rows(direct))
  }

  test("zone-map audit: scan sets cover matches; curve layouts never lose to lex on boxes") {
    val rows = Layout.zonemapPrune(spark, sf).collect()
    assert(rows.length == 3 * Layout.ZonePreds.length)
    val byKey = rows.map(r => (r.getAs[String]("layout"),
      r.getAs[Int]("pred_id")) -> r).toMap
    rows.foreach { r =>
      // zone maps are conservative: scanned buckets hold every match
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"), r)
      assert(r.getAs[Long]("buckets_scanned") <= r.getAs[Long]("n_buckets"), r)
    }
    // on the 2-D boxes (preds 1-3) the curve layouts scan no more
    // buckets than lexicographic; pred 4 (x-slice) is lex's home game
    // and is reported, not asserted — the audit exists to expose it
    Layout.ZonePreds.map(_._1).filter(_ <= 3).foreach { p =>
      val lex = byKey(("lex", p)).getAs[Long]("buckets_scanned")
      assert(byKey(("hilbert", p)).getAs[Long]("buckets_scanned") <= lex, s"pred $p")
      assert(byKey(("zorder", p)).getAs[Long]("buckets_scanned") <= lex, s"pred $p")
    }
  }

  test("the hilbert key is one fold expression: no shuffle, no join") {
    import spark.implicits._
    val audited = graft.plans.PlanChecks.audit(
      Layout.withHilbert(
        Tables.lineitem(spark, sf).select(
          col("l_partkey").bitwiseAND(lit(Layout.HMask)).as("x"),
          col("l_suppkey").bitwiseAND(lit(Layout.HMask)).as("y")),
        col("x"), col("y"), "hd"))
    assert(audited.shuffleExchanges == 0 && audited.joins == 0, audited)
  }

  test("the layout key is a pure projection: no shuffle, no join in its plan") {
    val audited = graft.plans.PlanChecks.audit(
      Tables.lineitem(spark, sf)
        .select(Layout.zorderKey(col("l_partkey"), col("l_suppkey")).as("z")))
    assert(audited.shuffleExchanges == 0 && audited.joins == 0, audited)
  }

  test("compaction plan: contiguous curve ranges, full coverage, bounded skew") {
    val plan = Layout.compactionPlan(spark, sf).collect()
    val buckets = Layout.hilbertLayout(spark, sf).collect()
    // coverage: every bucket's rows land in exactly one planned file
    assert(plan.map(_.getLong(2)).sum == buckets.map(_.getLong(1)).sum)
    assert(plan.map(_.getLong(1)).sum == buckets.length)
    // contiguity: files' bucket ranges ascend without interleaving —
    // the property that keeps zone-map pruning intact post-compaction
    val ranges = plan.sortBy(_.getLong(0))
      .map(r => (r.getLong(3), r.getLong(4)))
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges interleave: $hi >= $lo2")
      case _ =>
    }
    // evenness: the proportional cut cannot produce a file more than
    // (largest single bucket + target) rows — no file holds more than
    // 2x the even share unless one bucket alone exceeds the share
    val total = plan.map(_.getLong(2)).sum
    val target = total / Layout.CompactionFiles
    val maxBucket = buckets.map(_.getLong(1)).max
    assert(plan.map(_.getLong(2)).max <= target + maxBucket,
      s"a planned file exceeds target+maxBucket")
  }
}
