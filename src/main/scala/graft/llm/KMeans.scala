package graft.llm

import graft.functions.VectorFunctions.{dot_d, dot_fd}
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Lloyd's k-means over the embedding corpus — the learned quantizer
 * behind [[Pipeline.ivfAnn]]'s coarse cells and the `q63` cluster-stats
 * query.
 *
 * Iteration shape (the classic distributed k-means):
 *  - centroids live in a broadcast (k × dim doubles — tiny);
 *  - the assignment pass is one narrow scan: codegen'd
 *    [[graft.functions.DotProductD]]/[[graft.functions.DotProductFD]]
 *    distances against centroid literals + a `least(struct…)` argmin;
 *  - the update pass posexplodes to (cluster, dim) and decimal-sums —
 *    map-side partial aggregation collapses each partition to
 *    k × dim rows before the exchange, so the shuffle is
 *    O(partitions), not O(rows).
 *
 * Per iteration over 10^9 vectors: one scan + one tiny shuffle. The
 * driver holds only k centroids; `collect()` never touches corpus rows.
 *
 * Fully deterministic, which is what lets q63 carry a DuckDB oracle:
 *  - init takes the k lowest stride-matching vec_ids
 *    (`orderBy` BEFORE `limit`, so the choice is never
 *    partition-order-dependent);
 *  - centroid updates sum `v · 2^48` per (cluster, dim) over
 *    DECIMAL(38,0) — the fixture floats carry ≤43 fractional bits, so
 *    every addend is an exact integer and the sum is independent of
 *    partition merge order (same discipline as [[labelCentroids]],
 *    asserted by the fixture-invariant check in ContractSpec); the
 *    final `sum / 2^48 / n` performs the only two roundings and any
 *    IEEE-754 engine performs them identically;
 *  - distances fold left-to-right in double and ties break on
 *    centroid id, so assignment replays bit-identically in DuckDB.
 */
object KMeans {

  final case class Model(centroids: Seq[(Int, Array[Double])], inertia: Double)

  /** 2^48 — the exact-integer scaling used for order-independent
    * centroid sums. */
  val Scale = 281474976710656.0

  private[llm] def sqDist(v: org.apache.spark.sql.Column, c: Array[Double]) = {
    // |v - c|² = |v|² - 2 v·c + |c|², computed with the codegen dot
    // products against the broadcast centroid literal (kept in full
    // double precision — casting updated centroids back to float would
    // discard the determinism the decimal sums bought)
    val cLit = array(c.map(lit(_)): _*)
    val cNorm = lit(c.map(x => x * x).sum)
    dot_d(v, v) - lit(2.0) * dot_fd(v, cLit) + cNorm
  }

  /** Assign every vector to its nearest centroid (ties → lowest cid). */
  private def assign(emb: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val distCols = centroids.map { case (cid, c) =>
      struct(sqDist(col("embedding"), c).as("d"), lit(cid).as("cid"))
    }
    emb.withColumn("best", least(distCols: _*))
      .select(col("vec_id"), col("embedding"),
        col("best.cid").as("cluster"), col("best.d").as("dist"))
  }

  /** Run Lloyd's iterations; k clusters, deterministic stride-sampled
    * init (k lowest matching vec_ids). */
  def fit(spark: SparkSession, dir: String, k: Int = 8, iters: Int = 5): Model =
    fitOf(Tables.embeddings(spark, dir), k, iters)

  /** [[fit]] over an explicit corpus DataFrame (`vec_id`, `embedding`)
    * — the planted-recall certifications train the same quantizer over
    * the augmented corpus. Memoized per (corpus, k, iters) via
    * [[ModelCache]]: the fit is deterministic, so every query serving
    * the same learned cells reuses one training run, as a deployed
    * index would. */
  private[llm] def fitOf(emb0: DataFrame, k: Int, iters: Int): Model =
    ModelCache.memo(emb0, s"kmeans|$k|$iters")(fitImpl(emb0, k, iters))

  private def fitImpl(emb0: DataFrame, k: Int, iters: Int): Model = {
    val emb = emb0.select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    val stride = math.max(1L, n / k)
    var centroids: Seq[(Int, Array[Double])] = emb
      .filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(k).collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble).toArray }
    var inertia = Double.MaxValue
    for (_ <- 0 until iters) {
      val assigned = assign(emb, centroids)
      // one pass: per-(cluster, dim) exact scaled sums for the update,
      // plus the inertia ride-along on the dim-0 rows (inertia is
      // diagnostic-only — it never reaches an oracled output)
      val updated = assigned
        .select(col("cluster"), col("dist"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(
          sum((col("v").cast("double") * lit(Scale)).cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"),
          sum(when(col("dim") === 0, col("dist")).otherwise(lit(0.0))).as("in"))
        .select(col("cluster"), col("dim"),
          (col("s").cast("double") / lit(Scale) / col("n")).as("v"), col("in"))
        .collect()
      inertia = updated.filter(_.getInt(1) == 0).map(_.getDouble(3)).sum
      centroids = updated.groupBy(_.getInt(0)).toSeq.map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }.sortBy(_._1)
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
   * not O(rows).
   */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(
        sum((col("v").cast("double") * lit(Scale)).cast("decimal(38,0)")).as("scaled"),
        count(lit(1)).as("n_vectors"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        (col("scaled").cast("double") / lit(Scale) / col("n_vectors")).as("value"),
        col("n_vectors"))
      .orderBy("label", "dim")
  }

  /**
   * Final cluster assignment + per-cluster stats. Output is
   * integer-only (counts and vec_id extrema) — hash-stable and
   * DuckDB-replayable: the oracle re-runs the identical Lloyd's
   * iterations as chained CTEs (see `SparkEntry.kmeansOracleSql`).
   */
  def clusterStats(spark: SparkSession, dir: String, k: Int = 8, iters: Int = 3): DataFrame = {
    val model = fit(spark, dir, k, iters)
    val assigned = assign(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      model.centroids)
    assigned
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"),
        sum(col("vec_id")).as("sum_vec_id"))
      .orderBy("cluster")
  }
}
