package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Probabilistic-structure operators built as plain relational plans:
 * the sketch construction itself is a group-by (mergeable, map-side
 * combinable — the property that makes these structures work on a
 * 1000-executor cluster), and because every hash is md5-derived the
 * whole construction is deterministic and bit-replayable by the
 * DuckDB oracle — no allowlist needed, unlike engine-private sketch
 * internals (q53's HLL/approx_percentile, which get envelope gating
 * instead).
 *
 * Reference semantics: the reference pipeline ships aggregate counts
 * per entity page (reference app/hs_contacts.py:66,121); these are the
 * sublinear-memory counterparts a 100 TB deployment of the same
 * pipeline needs.
 */
object Sketches {

  /** Hex→long of the first `hexDigits` md5 chars of `salt:key` — the
    * one deterministic hash family both engines can replay (playbook:
    * never engine-private hashes). 6 hex digits keep the value < 2^24,
    * far from Long overflow under later arithmetic. */
  private def md5Bucket(salt: Column, key: Column, hexDigits: Int): Column =
    conv(substring(md5(concat(salt.cast("string"), lit(":"), key.cast("string"))),
      1, hexDigits), 16, 10).cast("long")

  val CmsDepth = 4    // hash rows d
  val CmsWidth = 256L // counters per row w: eps ~ e/w of total count N

  /**
   * Count-min sketch frequency estimation over the event stream's
   * user_id (CM sketch, Cormode & Muthukrishnan 2005). The sketch is
   * `CmsDepth × CmsWidth` counters built by ONE group-by over
   * (hash_row, bucket) — partial aggregation sums counters map-side,
   * so the shuffle moves at most `d·w` rows per input partition no
   * matter how many events: the mergeability that lets 1000 executors
   * each sketch their slice and combine for free.
   *
   * Output: the top-16 users by exact count, their exact count, the
   * CMS estimate (min over the d row counters), and `no_undercount` —
   * the CMS theorem that estimates never undercount, which holds
   * under ANY partition layout; md5-bucketing makes even the estimate
   * values deterministic, so the oracle replays them exactly rather
   * than allowlisting.
   */
  def countMinFrequency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val hashRows = expr(s"sequence(0, ${CmsDepth - 1})")
    def bucket = pmod(md5Bucket(col("r"), col("user_id"), 6), lit(CmsWidth))
    val sketch = ev
      .select(col("user_id"), explode(hashRows).as("r"))
      .withColumn("bucket", bucket)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val top = ev
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id"))
      .limit(16)
    top
      .select(col("user_id"), col("exact_n"), explode(hashRows).as("r"))
      .withColumn("bucket", bucket)
      // the sketch is d·w rows — bounded by construction; AQE sees the
      // tiny aggregate output and broadcasts it without a forced hint
      .join(sketch, Seq("r", "bucket"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
      .withColumn("no_undercount", col("cms_est") >= col("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  /**
   * Mergeable-quantile verification harness: per event_type, exact
   * p25/p50/p75 (quantile_cont interpolation via
   * [[graft.ops.GlobalOrder.groupedQuantiles]]) next to
   * [[graft.functions.KllQuantileAgg]]'s sketch, gated the q102 way.
   * The sketch's estimates are partition-layout-dependent, so what's
   * emitted is the exact quantiles plus three booleans asserting the
   * sketch's one-sided rank guarantee — `count(v ≤ est) ≥ t` and
   * `count(v < est) < t + slack` for target rank t — which hold under
   * ANY layout, so the oracle pins them TRUE and a sketch regression
   * fails the hash gate.
   *
   * Scale pitch: the sketch is the 100 TB path — O(k·log n) bytes per
   * group, merged map-side; the exact arm is the verification twin
   * (same relationship as q34's brute-force cosine to q36/q52's ANN)
   * and even IT avoids the builtin `percentile()`'s few-key buffer:
   * grouped global ranks keep the exact computation core-parallel.
   */
  def kllQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllQuantileAgg.kll_quantiles
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val sk = ev.groupBy(col("event_type"))
      .agg(kll_quantiles(col("value")).as("sk"))
      .select(col("event_type"), col("sk.n").as("sk_n"), col("sk.slack"),
        col("sk.est25"), col("sk.est50"), col("sk.est75"))
    // exact rank of each estimate: the estimate table is one row per
    // event_type (categorical), so AQE broadcasts it unhinted
    val ranks = ev.join(sk, "event_type")
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") <= col("est25"), 1L).otherwise(0L)).as("le25"),
        sum(when(col("value") <  col("est25"), 1L).otherwise(0L)).as("lt25"),
        sum(when(col("value") <= col("est50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") <  col("est50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("est75"), 1L).otherwise(0L)).as("le75"),
        sum(when(col("value") <  col("est75"), 1L).otherwise(0L)).as("lt75"))
    // count the VALUES, not the rows: the sketch skips NULL inputs,
    // so an all-rows count would break sketch_n_ok (and skew the
    // rank targets) on the first NULL value — the booleans must be
    // null-independent, not just layout-independent (groupedQuantiles
    // likewise interpolates over the non-null multiset)
    val exact = ev.groupBy(col("event_type"))
      .agg(count(col("value")).as("n"))
      .join(graft.ops.GlobalOrder.groupedQuantiles(
        ev, keyCols = Seq("event_type"), valueCol = "value",
        ps = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))), Seq("event_type"))
    def ok(t: Column, le: Column, lt: Column, slack: Column): Column =
      le >= t && lt < t + slack
    exact.join(sk, "event_type").join(ranks, "event_type")
      // integer `div`: `/` on Longs is lossy double division in Spark
      .withColumn("t25", expr("(n + 3) div 4"))
      .withColumn("t50", expr("(n + 1) div 2"))
      .withColumn("t75", expr("(3 * n + 3) div 4"))
      // coalesce to (n === 0): a group whose values are ALL NULL yields
      // a NULL sketch struct (KllQuantileAgg.eval at n==0), which would
      // surface NULL booleans against the oracle's literal TRUE — an
      // empty-value group is vacuously within bounds (round-5 advice)
      .select(col("event_type"), col("n"), col("p25"), col("p50"), col("p75"),
        coalesce(col("sk_n") === col("n"), col("n") === 0L).as("sketch_n_ok"),
        coalesce(ok(col("t25"), col("le25"), col("lt25"), col("slack")),
          col("n") === 0L).as("p25_ok"),
        coalesce(ok(col("t50"), col("le50"), col("lt50"), col("slack")),
          col("n") === 0L).as("p50_ok"),
        coalesce(ok(col("t75"), col("le75"), col("lt75"), col("slack")),
          col("n") === 0L).as("p75_ok"))
      .orderBy(col("event_type"))
  }

  val BloomBits   = 8192L
  val BloomHashes = 3

  /**
   * Bloom-filter semi-join: the distributed runtime-filter pattern —
   * build a bloom filter over the SMALL side's join keys (customers
   * holding a >200k order), broadcast it, and prune the probe side
   * BEFORE the exact join. At 100 TB this turns a full-shuffle
   * semi-join into a broadcast filter plus a shuffle of only the
   * ~matching rows; Spark's own
   * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects exactly
   * this shape with an engine-private filter, which this operator
   * swaps for a replayable md5 one.
   *
   * The filter is the SET of set bit positions (the distinct
   * `BloomHashes` md5 buckets of every build key — at most `BloomBits`
   * rows, a bitmap expressed relationally), so construction is one
   * distinct-aggregate and the probe is a bucket semi-join that both
   * engines replay bit-identically.
   *
   * Output (per market segment): probe population, bloom candidates,
   * bloom-then-verify members, direct semi-join members, false
   * positives — plus `no_false_negatives`, the bloom guarantee that
   * verify-after-bloom loses nothing vs the direct semi-join, which
   * must hold under any layout (the oracle replays every column AND
   * the boolean).
   */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val hashes = expr(s"sequence(0, ${BloomHashes - 1})")
    def pos = pmod(md5Bucket(col("h"), col("key"), 6), lit(BloomBits))
    val buildKeys = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("key")).distinct()
    val bits = buildKeys
      .select(col("key"), explode(hashes).as("h"))
      .withColumn("pos", pos)
      .select(col("pos")).distinct()
    val customers = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_mktsegment"))
    val candidates = customers
      .withColumn("h", explode(hashes))
      .withColumn("pos", pos)
      // bitmap join: a candidate needs ALL k bits set. The bit set is
      // <= BloomBits rows at any scale; AQE broadcasts it unhinted.
      .join(bits, Seq("pos"), "left_semi")
      .groupBy(col("key"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === BloomHashes)
      .select(col("key"), col("c_mktsegment"))
    val verified = candidates.join(buildKeys, Seq("key"), "left_semi")
    val direct = customers.join(buildKeys, Seq("key"), "left_semi")
    def seg(df: DataFrame, as: String) =
      df.groupBy(col("c_mktsegment")).agg(count(lit(1)).as(as))
    seg(customers, "n_customers")
      .join(seg(candidates, "n_candidates"), Seq("c_mktsegment"), "left")
      .join(seg(verified, "n_members"), Seq("c_mktsegment"), "left")
      .join(seg(direct, "n_direct"), Seq("c_mktsegment"), "left")
      .select(
        col("c_mktsegment"),
        col("n_customers"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        coalesce(col("n_direct"), lit(0L)).as("n_direct"))
      .withColumn("n_false_pos", col("n_candidates") - col("n_members"))
      .withColumn("no_false_negatives", col("n_members") === col("n_direct"))
      .orderBy(col("c_mktsegment"))
  }
}
