package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("count-min estimates never undercount and bound the overestimate") {
    val r = Sketches.countMinFrequency(spark, sf).cache()
    assert(r.count() > 0)
    // the CMS theorem: est >= exact for every queried key, any layout
    assert(r.filter(col("cms_est") < col("exact_n")).count() == 0)
    assert(r.filter(!col("no_undercount")).count() == 0)
    // overestimate bound: est - exact <= N (trivial) and, with d=4 rows
    // of w=256 counters, the expected excess is N/w — allow 8x slack
    val n = Tables.events(spark, sf).count()
    val worst = r.agg(max(col("cms_est") - col("exact_n"))).head.getLong(0)
    assert(worst <= (8 * n) / Sketches.CmsWidth,
      s"excess $worst vs bound ${(8 * n) / Sketches.CmsWidth}")
  }

  test("bloom semi-join loses nothing vs the direct semi-join") {
    val r = Sketches.bloomSemiJoin(spark, sf).cache()
    assert(r.count() > 0)
    // bloom guarantee: verify-after-bloom == direct semi-join, per segment
    assert(r.filter(!col("no_false_negatives")).count() == 0)
    assert(r.filter(col("n_members") =!= col("n_direct")).count() == 0)
    // candidates sit between members and the whole probe population
    assert(r.filter(col("n_candidates") < col("n_members")).count() == 0)
    assert(r.filter(col("n_candidates") > col("n_customers")).count() == 0)
    assert(r.filter(col("n_false_pos") < 0).count() == 0)
  }
}
