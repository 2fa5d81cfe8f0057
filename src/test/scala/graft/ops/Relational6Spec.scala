package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class Relational6Spec extends SparkSpec {

  test("equi-depth histogram: near-equal buckets tiling the price range") {
    val h = Relational6.equidepthHistogram(spark, sf).collect()
    assert(h.map(_.getLong(0)).toSeq == (1L to Relational6.HistBuckets).toSeq)
    val counts = h.map(_.getLong(1))
    assert(counts.sum == Tables.orders(spark, sf).count())
    assert(counts.max - counts.min <= 1, "equi-depth buckets must differ by at most 1")
    // bucket value ranges are ordered and non-overlapping
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2), s"bucket overlap: $a vs $b")
    }
  }

  test("MAD outliers: robust stats bounded by the group's own values") {
    val rows = Relational6.madOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mad, nOut) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(mad >= 0.0 && nOut >= 0 && nOut <= n, s"$r")
    }
    // robustness: MAD flags only a small tail, never the majority
    assert(rows.forall(r => r.getLong(4) * 2 < r.getLong(1)))
  }

  test("basket pairs: prune respected, counts consistent, lift exact") {
    val rows = Relational6.basketPairs(spark, sf).collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    rows.foreach { r =>
      val (pa, pb, nBoth, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pa < pb)
      assert(nBoth <= math.min(na, nb), s"pair count exceeds a support: $r")
      assert(na >= Relational6.BasketMinSupport && nb >= Relational6.BasketMinSupport)
      assert(r.getDouble(5) > 0.0)
    }
    // spot-exact: recompute the top pair's co-occurrence directly
    val top = rows.head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val expected = li.filter(col("l_partkey") === top.getLong(0))
      .select(col("l_orderkey"))
      .intersect(li.filter(col("l_partkey") === top.getLong(1))
        .select(col("l_orderkey")))
      .count()
    assert(top.getLong(2) == expected, s"top pair count drifted: $top vs $expected")
  }

  test("order concurrency: sweep maxima are sane and order counts add up") {
    val rows = Relational6.orderConcurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalWithLines = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(rows.map(_.getLong(2)).sum == totalWithLines)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2),
        s"concurrency outside [1, n_orders]: $r")
    }
  }
}
