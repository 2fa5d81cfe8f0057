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
