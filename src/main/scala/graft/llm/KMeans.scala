package graft.llm

import graft.functions.VectorFunctions.dot_d
import graft.functions.VectorMeanAgg.vector_mean
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lloyd's k-means over the embedding corpus — the "learned" counterpart
 * of the stride-sampled IVF cells in [[Pipeline.ivfAnn]].
 *
 * Iteration shape (the classic distributed k-means):
 *  - centroids live in a broadcast (k × dim doubles — tiny);
 *  - the assignment pass is one narrow scan: cross join with the
 *    broadcast + codegen'd [[graft.functions.DotProductD]] distances +
 *    window argmin;
 *  - the update pass is one shuffle of [[VectorMeanAgg]]'s (sums, count)
 *    buffers — k × 520 bytes per partition, independent of row count.
 *
 * Per iteration over 10^9 vectors: one scan + one tiny shuffle. The
 * driver holds only k centroids; `collect()` never touches corpus rows.
 * Deterministic: stride-sampled init, ties broken by centroid id.
 */
object KMeans {

  final case class Model(centroids: Seq[(Int, Array[Double])], inertia: Double)

  private def sqDist(v: org.apache.spark.sql.Column, c: Array[Double]) = {
    // |v - c|² = |v|² - 2 v·c + |c|², computed with the codegen dot
    // product against the broadcast centroid literal
    val cLit = array(c.map(x => lit(x.toFloat)): _*).cast("array<float>")
    val cNorm = lit(c.map(x => x * x).sum)
    dot_d(v, v) - lit(2.0) * dot_d(v, cLit) + cNorm
  }

  /** Assign every vector to its nearest centroid. */
  private def assign(emb: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val distCols = centroids.map { case (cid, c) =>
      struct(sqDist(col("embedding"), c).as("d"), lit(cid).as("cid"))
    }
    emb.withColumn("best", least(distCols: _*))
      .select(col("vec_id"), col("embedding"),
        col("best.cid").as("cluster"), col("best.d").as("dist"))
  }

  /** Run Lloyd's iterations; k clusters, stride-sampled deterministic
    * init. */
  def fit(spark: SparkSession, dir: String, k: Int = 8, iters: Int = 5): Model = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    val stride = math.max(1L, n / k)
    var centroids: Seq[(Int, Array[Double])] = emb
      .filter(pmod(col("vec_id"), lit(stride)) === 0).limit(k)
      .orderBy("vec_id").collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble).toArray }
    var inertia = Double.MaxValue
    for (_ <- 0 until iters) {
      val assigned = assign(emb, centroids)
      val updated = assigned
        .groupBy(col("cluster"))
        .agg(vector_mean(col("embedding")).as("c"), sum(col("dist")).as("in"))
        .orderBy("cluster").collect()
      inertia = updated.map(_.getDouble(2)).sum
      centroids = updated.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toSeq
    }
    emb.unpersist()
    Model(centroids, inertia)
  }

  /** Final cluster assignment + per-cluster stats as a DataFrame. */
  def clusterStats(spark: SparkSession, dir: String, k: Int = 8, iters: Int = 3): DataFrame = {
    val model = fit(spark, dir, k, iters)
    val assigned = assign(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      model.centroids)
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("dist")).as("inertia"))
      .orderBy("cluster")
  }
}
