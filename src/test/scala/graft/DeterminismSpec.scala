package graft

/**
 * Partition-order independence: the bit-exact oracle story rests on
 * results not depending on how rows are split across tasks (decimal
 * sums, md5 hashing, explicit tie-breaks — never a float fold across
 * partition boundaries). This spec re-runs the most order-sensitive
 * queries under a different shuffle-partition count and demands
 * IDENTICAL rows — the cluster-size-invariance a 100 TB deployment
 * needs when it scales executors up or down between runs.
 */
class DeterminismSpec extends SparkSpec {

  private val risky = Seq(
    "q61_label_centroids",  // scaled-decimal centroid sums
    "q63_kmeans",           // iterative clustering on those sums
    "q49_salted_agg",       // two-phase salted aggregation
    "q60_variance",         // decimal-exact moments
    "q77_correlation",      // decimal-exact Pearson r
    "q32_minhash_lsh",      // LSH bucketing + verify joins
    "q53_approx_sketches",  // sketch error-envelope booleans
    "q94_topk_per_key",     // custom bounded-heap operator (tie-broken)
    "q95_repeated_passages", // top-100 cut under a total ordering
    "q97_oov_rate",         // vocabulary head cut (count desc, token)
    "q68_inverted_index",   // heap-picked ordered postings head
    "q69_dedup_survivors",  // cluster labels from LSH + propagation
    "q100_rank_rewrite",    // optimizer-rewritten top-k (tie-broken)
    "q101_incremental_dedup", // cross-corpus LSH bucketing + verify
    "q102_heavy_hitters",   // MG coverage boolean must hold any layout
    "q103_countmin",        // md5-bucketed sketch counters + min-estimate
    "q104_bloom_join",      // md5 bit positions + candidate verify
    "q105_pmi",             // top-200 cut under double-ratio ordering
    "q107_window_zscore",   // decimal window moments -> double z
    "q110_stratified_sample", // md5 ranking + exact quota cut
    "q111_kll_quantiles",   // KLL rank-guarantee booleans any layout
    "q116_incremental_agg", // state+delta decimal merge ≡ recompute
    "q120_upsert",          // anti-join survivors ∪ upserts
    "q126_gap_fill",        // forward fill over ordered window
    "q128_point_in_interval", // SCD2 coverage booleans any layout
    // grouped-GlobalOrder family: a different partition count changes
    // the (key, pid) SEGMENT layout — ranks/prefixes/trailing sums must
    // compose identically from any segmentation
    "q67_distribution_ranks",
    "q138_quantile_normalize",
    "q140_order_concurrency",
    "q146_source_quantiles",
    "q147_nucleus_vocab",
    // recall audits: heap cuts + md5 planes + k-means, all tie-broken
    "q149_ann_recall",
    "q150_multiprobe_recall",
    "q151_ivf_recall",
    // collect_set order varies with partition layout; the result is
    // deterministic ONLY through the sort_array normalization — pin it
    "q175_cross_source_exact")

  test("results are identical under a different shuffle-partition count") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    risky.foreach { name =>
      val base = SparkEntry.queries(name)(spark, sf).collect().toSeq
      try {
        spark.conf.set(key, "7")
        val alt = SparkEntry.queries(name)(spark, sf).collect().toSeq
        assert(base == alt,
          s"$name changed under $key=7 (partition-order-dependent result)")
      } finally spark.conf.set(key, before)
      spark.catalog.clearCache()
    }
  }
}
