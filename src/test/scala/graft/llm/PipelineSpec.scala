package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("training pipeline output satisfies every filter") {
    val tp = Pipeline.trainingPipeline(spark, sf).cache()
    assert(tp.count() > 0)
    assert(tp.filter(col("n_tokens") < 20 || col("n_tokens") > 500).count() == 0)
    assert(tp.filter(col("stop_ratio") < 0.02).count() == 0)
    assert(tp.filter(col("avg_word_len") < 2.0 || col("avg_word_len") > 12.0).count() == 0)
  }

  test("array stats: min <= mean <= max, norm positive, dim 64") {
    val st = Pipeline.arrayStats(spark, sf).cache()
    assert(st.filter(col("dim") =!= 64).count() == 0)
    assert(st.filter(col("v_min") > col("v_mean") || col("v_mean") > col("v_max")).count() == 0)
    assert(st.filter(col("l2_norm") <= 0.0).count() == 0)
  }

  test("near-dup clusters: every paired doc labeled, label = component minimum") {
    val clusters = Pipeline.nearDupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashLsh(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // both endpoints of every near-dup pair share a cluster label
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // labels are component minima: every label is a member's id ≤ members
    clusters.foreach { case (doc, lab) => assert(lab <= doc && clusters(lab) == lab) }
  }

  test("hash sampling is deterministic and rate-skewed per language") {
    val s1 = Pipeline.deterministicSample(spark, sf).collect()
    val s2 = Pipeline.deterministicSample(spark, sf).collect()
    assert(s1.sameElements(s2))
    val byLang = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val total = graft.model.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en kept at ~25%, others at ~75%
    assert(byLang("en").toDouble / total("en") < 0.5)
    assert(byLang.filter(_._1 != "en").map(_._2).sum.toDouble /
      total.filter(_._1 != "en").values.sum > 0.5)
  }

  test("source mixing caps every source at 30 docs, keeping the longest") {
    val m = Pipeline.sourceMixing(spark, sf).cache()
    val perSource = m.groupBy("source").count()
    assert(perSource.filter(col("count") > 30).count() == 0)
  }

  test("IVF-ANN: every neighbor shares the query's cell; decent recall vs brute force") {
    val ivf = Pipeline.ivfAnn(spark, sf).cache()
    assert(ivf.count() > 0)
    // neighbors come from the query's cell by construction; ranks contiguous
    val perQ = ivf.groupBy("q_id").agg(min("rnk").as("mn"), countDistinct("cell").as("nc"))
    assert(perQ.filter(col("mn") =!= 1 || col("nc") =!= 1).count() == 0)
    // recall sanity: IVF top-1 should be in brute-force top-10 for >half
    // the queries (coarse single-probe IVF loses some)
    val bf = Similarity.cosineTopK(spark, sf).select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivfTop1 = ivf.filter(col("rnk") === 1).select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hits = ivfTop1.count { case (q, n) => bf.get(q).exists(_.contains(n)) }
    assert(hits * 2 >= ivfTop1.length,
      s"IVF top-1 recall too low: $hits/${ivfTop1.length}")
  }
}
