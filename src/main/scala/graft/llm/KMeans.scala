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

  /**
   * Per-label centroid of the embedding corpus, emitted as
   * `(label, dim, value, n_vectors)` scalar rows.
   *
   * Determinism: a double fold across partitions is order-dependent, so
   * instead each element is scaled by 2^48 — the fixture floats carry at
   * most 43 fractional bits, so `v · 2^48` is an exact integer — and the
   * per-(label, dim) sum runs over DECIMAL(38,0): exact, overflow-proof
   * to ~10^38, and independent of partition merge order. The final
   * `sum / 2^48 / n` performs the only two roundings, and any IEEE-754
   * engine performs them identically, which is what lets this query be
   * oracle-checked bit-for-bit.
   *
   * Scale: `posexplode` widens rows 64× before aggregation, but partial
   * (map-side) aggregation collapses each partition to labels × 64
   * decimal rows before the exchange, so the shuffle is O(partitions),
   * not O(rows). [[graft.functions.VectorMeanAgg]] remains the compact
   * buffer used inside the k-means loop where double means suffice.
   */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val scale = 281474976710656.0 // 2^48
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(
        sum((col("v").cast("double") * lit(scale)).cast("decimal(38,0)")).as("scaled"),
        count(lit(1)).as("n_vectors"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        (col("scaled").cast("double") / lit(scale) / col("n_vectors")).as("value"),
        col("n_vectors"))
      .orderBy("label", "dim")
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
