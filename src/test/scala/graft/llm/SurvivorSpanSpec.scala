package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivorSpanSpec extends SparkSpec {

  test("quality survivors: one survivor per cluster, member of the cluster, counts consistent") {
    val labels = Pipeline.nearDupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Pipeline.qualitySurvivors(spark, sf).collect()
    assert(rows.nonEmpty)
    val clusters = labels.values.toSet
    assert(rows.map(_.getLong(0)).toSet == clusters,
      "one output row per cluster, no extras")
    rows.foreach { r =>
      val (cluster, nMembers, survivor, displaced) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))
      assert(labels.get(survivor).contains(cluster),
        s"survivor $survivor not a member of cluster $cluster")
      assert(displaced == nMembers - 1)
      assert(labels.values.count(_ == cluster).toLong == nMembers)
    }
  }

  test("quality survivors prefer the higher-quality member, not the lowest id") {
    // at least one cluster must pick a survivor that is NOT its lowest
    // id (otherwise the policy degenerates to q69's and the quality key
    // is dead weight) — holds on the fixture corpus
    val rows = Pipeline.qualitySurvivors(spark, sf).collect()
    assert(rows.exists(r => r.getLong(2) != r.getLong(0)),
      "every cluster picked its lowest id; quality key never decided")
  }

  test("dup-span coverage: planted shared span is fully covered in both docs") {
    import spark.implicits._
    val span = (1 to 9).map(i => s"plantedtok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta epsilon zeta"),
      (2L, s"one two three four $span five six"),
      (3L, "no shared content here at all just unique words forever"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanCoverageOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // 9 shared tokens → 3 shared 7-grams in each doc, covering 9 positions
    assert(out.keySet == Set(1L, 2L), s"unexpected docs flagged: ${out.keySet}")
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getLong(2) == 3L, s"doc $id dup-gram count")
      assert(out(id).getLong(3) == 9L, s"doc $id covered tokens")
    }
  }

  test("dup-span coverage invariants on the fixture corpus") {
    val rows = TextAnalysis.dupSpanCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nDup, nCov, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nCov <= nTok && nCov >= 7L, "coverage within doc bounds")
      assert(nDup <= nTok - 6L, "more dup grams than gram slots")
      assert(ppm == 1000000L * nCov / nTok)
    }
  }
}
