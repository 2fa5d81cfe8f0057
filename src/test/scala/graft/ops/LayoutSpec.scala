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

  test("the layout key is a pure projection: no shuffle, no join in its plan") {
    val audited = graft.plans.PlanChecks.audit(
      Tables.lineitem(spark, sf)
        .select(Layout.zorderKey(col("l_partkey"), col("l_suppkey")).as("z")))
    assert(audited.shuffleExchanges == 0 && audited.joins == 0, audited)
  }
}
