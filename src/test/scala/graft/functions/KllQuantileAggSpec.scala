package graft.functions

import graft.SparkSpec
import graft.functions.KllQuantileAgg.kll_quantiles
import org.apache.spark.sql.functions._

class KllQuantileAggSpec extends SparkSpec {

  // skewed fixture: a heavy constant run plus a spread tail — the shape
  // that breaks naive samplers
  private def fixture = {
    import spark.implicits._
    ((1 to 6000).map(_ => 42.0) ++ (1 to 4000).map(i => i.toDouble)).toDF("v")
  }

  test("sketch rank guarantee holds under 1, 3, and 16 partitions") {
    val exact = ((1 to 6000).map(_ => 42.0) ++ (1 to 4000).map(_.toDouble))
      .sorted.toArray
    val n = exact.length.toLong
    for (parts <- Seq(1, 3, 16)) {
      val row = fixture.repartition(parts)
        .agg(kll_quantiles(col("v")).as("sk"))
        .select("sk.n", "sk.slack", "sk.est25", "sk.est50", "sk.est75")
        .head
      assert(row.getLong(0) == n, s"parts=$parts: n")
      val slack = row.getLong(1)
      // error stays sub-linear: (n/k)·levels, nowhere near n
      assert(slack < n / 4, s"parts=$parts: slack $slack too large")
      for ((p, idx) <- Seq(0.25 -> 2, 0.5 -> 3, 0.75 -> 4)) {
        val est = row.getDouble(idx)
        val t = math.ceil(p * n).toLong
        val le = exact.count(_ <= est).toLong
        val lt = exact.count(_ < est).toLong
        assert(le >= t, s"parts=$parts p=$p: count(<=est)=$le < t=$t")
        assert(lt < t + slack, s"parts=$parts p=$p: count(<est)=$lt >= t+slack")
      }
    }
  }

  test("small groups (below one compaction) are exact") {
    import spark.implicits._
    val row = (1 to 50).map(_.toDouble).toDF("v").repartition(3)
      .agg(kll_quantiles(col("v")).as("sk"))
      .select("sk.n", "sk.slack", "sk.est50").head
    assert(row.getLong(0) == 50L)
    // no compaction happened: slack is just the max weight (1)
    assert(row.getLong(1) == 1L)
    assert(row.getDouble(2) == 25.0) // ceil(0.5*50) = rank 25
  }

  test("kllQuantiles gate: every boolean true at fixture scale") {
    val r = graft.ops.Sketches.kllQuantiles(spark, sf).cache()
    assert(r.count() > 0)
    Seq("sketch_n_ok", "p25_ok", "p50_ok", "p75_ok").foreach { c =>
      assert(r.filter(!col(c)).count() == 0, s"$c violated")
    }
  }
}
