package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  test("inertia does not increase across Lloyd's iterations") {
    val i1 = KMeans.fit(spark, sf, k = 4, iters = 1).inertia
    val i3 = KMeans.fit(spark, sf, k = 4, iters = 3).inertia
    val i5 = KMeans.fit(spark, sf, k = 4, iters = 5).inertia
    assert(i3 <= i1 + 1e-6, s"inertia rose: $i1 -> $i3")
    assert(i5 <= i3 + 1e-6, s"inertia rose: $i3 -> $i5")
  }

  test("cluster stats partition the corpus") {
    val st = KMeans.clusterStats(spark, sf, k = 4, iters = 2).cache()
    assert(st.count() <= 4)
    assert(st.agg(sum("n_vectors")).head.getLong(0) ==
      Tables.embeddings(spark, sf).count())
    assert(st.filter(col("min_vec_id") > col("max_vec_id")).count() == 0)
  }

  test("fit is deterministic (same init, same data, same result)") {
    val a = KMeans.fit(spark, sf, k = 4, iters = 2)
    val b = KMeans.fit(spark, sf, k = 4, iters = 2)
    assert(a.inertia == b.inertia)
    assert(a.centroids.map(_._1) == b.centroids.map(_._1))
  }
}
