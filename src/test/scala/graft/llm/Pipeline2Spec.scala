package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Specs for the round-5 pipeline additions: containment scoring,
  * stratified sampling, random projection, PMI collocations. */
class Pipeline2Spec extends SparkSpec {

  test("benchmark containment is a valid [0,1] fraction over eval docs only") {
    val r = Pipeline.benchmarkContainment(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(pmod(col("doc_id"), lit(100L)) >= 2L).count() == 0)
    assert(r.filter(col("containment") < 0.0 || col("containment") > 1.0).count() == 0)
    assert(r.filter(col("n_common") > col("n_shingles")).count() == 0)
  }

  test("stratified sample hits the exact per-stratum quota, deterministically") {
    val r = Pipeline.stratifiedSample(spark, sf).cache()
    val per = r.groupBy("source")
      .agg(count(lit(1)).as("n"), max("quota").as("q"), max("rk").as("maxrk"))
    assert(per.filter(col("n") =!= col("q")).count() == 0)
    assert(per.filter(col("maxrk") =!= col("q")).count() == 0)
    // quota is ceil(n_src/10) against the raw table
    val expected = Tables.documents(spark, sf).groupBy("source")
      .agg(expr("(count(1) + 9) div 10").as("want"))
    assert(per.join(expected, "source")
      .filter(col("n") =!= col("want")).count() == 0)
    // md5 ranking is layout-independent: two runs pick the same docs
    val again = Pipeline.stratifiedSample(spark, sf)
    assert(r.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
  }

  test("random projection matches a driver-side ±1 dot product") {
    val r = Pipeline.randomProjection(spark, sf).cache()
    val row = r.orderBy("vec_id").head
    val vecId = row.getLong(0)
    val emb = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === vecId)
      .select("embedding").head.getSeq[Float](0)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    for (i <- 0 until 8) {
      var acc = 0.0
      for (j <- 1 to emb.length) {
        val sign = if ("02468ace".contains(md5hex(s"proj$i:$j").charAt(0))) 1.0 else -1.0
        acc += sign * emb(j - 1).toDouble
      }
      assert(row.getDouble(1 + i) == acc, s"p$i mismatch for vec $vecId")
    }
  }

  test("pmi collocations rank by ratio with exact supporting counts") {
    val r = TextAnalysis.pmiCollocations(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("n_xy") < 10).count() == 0)
    assert(r.filter(col("pmi_ratio") <= 0.0).count() == 0)
    // ordering is by ratio descending
    val ratios = r.select("pmi_ratio").collect().map(_.getDouble(0))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
    // spot-check one bigram's counts against direct aggregation
    val top = r.head
    val (w1, w2, nxy) = (top.getString(0), top.getString(1), top.getLong(2))
    val direct = Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")).as("b"))
      .filter(col("b.w1") === w1 && col("b.w2") === w2)
      .count()
    assert(direct == nxy)
  }
}
