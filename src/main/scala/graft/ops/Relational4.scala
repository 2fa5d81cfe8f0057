package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal-modeling operators over the event stream: slowly-changing-
 * dimension snapshots and windowed anomaly scoring — the shapes a
 * warehouse layer on top of the reference's polled CRM feed needs
 * (the reference emits raw change events, reference
 * app/hs_contacts.py:121; these operators turn that feed into
 * queryable history).
 */
object Relational4 {

  /**
   * SCD2 (type-2 slowly-changing-dimension) interval build: collapse
   * each user's event-type stream into versioned validity intervals —
   * one row per run of equal `event_type`, with `valid_from_ms` /
   * `valid_to_ms` (null = current) and a version number.
   *
   * Plan shape: both window functions (the change detector's lag and
   * the interval close's lead) share ONE partitioning on user_id, so
   * the whole operator is a single shuffle + two sorted window passes
   * — no self-join against "the next row", which is the O(N²)
   * formulation this replaces. Partitioning by the entity key is
   * exactly how it scales: 100 TB of events still means each user's
   * (small) history sits in one task.
   */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    // the change-row pass reuses the SAME window spec: both passes must
    // order identically or versions desynchronize from interval closes
    e.withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_from_ms", col("ts_ms"))
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(byUser) - 1L)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_ms"), col("valid_to_ms"))
      .orderBy(col("user_id"), col("version"))
  }

  /**
   * Temporal point-in-interval join: every event matched to the SCD2
   * interval valid at its timestamp — the "as of this moment, what was
   * the dimension state" lookup that versioned warehouses exist for.
   * The join is user-key EQUALITY plus a range residual (open-ended
   * current intervals via null-safe coalesce), so Spark plans a plain
   * hash join on user_id with the range as a post-join filter — never
   * a range-only cross product. The self-consistency check (an
   * event's type must equal its covering interval's type, and exactly
   * one interval must cover each event) is emitted as counts the
   * oracle recomputes.
   */
  def pointInInterval(spark: SparkSession, dir: String): DataFrame = {
    val intervals = scd2Intervals(spark, dir)
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("e_type"),
        Tables.epochMs(col("ts")).as("ts_ms"))
    e.join(intervals, Seq("user_id"))
      .filter(col("ts_ms") >= col("valid_from_ms") &&
        col("ts_ms") <= coalesce(col("valid_to_ms"), lit(Long.MaxValue)))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_matched"),
        countDistinct(col("event_id")).as("n_events"),
        sum(when(col("e_type") === col("event_type"), 1L).otherwise(0L))
          .as("n_type_consistent"),
        max(col("version")).as("n_versions"))
      .withColumn("coverage_ok",
        col("n_matched") === col("n_events") &&
          col("n_type_consistent") === col("n_matched"))
      .orderBy(col("user_id"))
  }

  /**
   * Ordered conversion funnel (view → click → purchase): per user, the
   * first view, the first click strictly AFTER that view, and the
   * first purchase strictly after that click — order matters, which is
   * what separates a funnel from three independent filters.
   *
   * Plan: three aggregates joined on user_id — every stage keys on the
   * SAME column, so the exchange is planned once and reused across
   * stages (the shuffle-reuse shape); stage tables only ever shrink.
   * Timestamps are exact epoch-ms integers, so stage mins are
   * deterministic.
   */
  def conversionFunnelBatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_ms") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_ms") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy(col("user_id"))
  }

  /**
   * Weekly retention cohorts: users grouped by the week of their first
   * event; each later week of activity increments that cohort's
   * retention cell. The activity matrix is (cohort_week × offset) —
   * the standard growth-analytics artifact.
   *
   * Distinct users per cell via pre-aggregation to (user, cohort,
   * offset) — not countDistinct's Expand (the q95 lesson); both
   * aggregations and the cohort join key on user_id first, so the
   * wide fact table is shuffled once.
   */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val WeekMs = 7L * 24 * 3600 * 1000
    val e = Tables.events(spark, dir)
      .select(col("user_id"), Tables.epochMs(col("ts")).as("ts_ms"))
    val cohort = e.groupBy(col("user_id"))
      .agg(expr(s"min(ts_ms) div $WeekMs").as("cohort_week"))
    val cells = e.join(cohort, "user_id")
      .withColumn("offset", expr(s"ts_ms div $WeekMs") - col("cohort_week"))
      .select(col("user_id"), col("cohort_week"), col("offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_week"), col("offset"))
  }

  /**
   * Unpivot (wide → long): per-returnflag aggregates melted into
   * (flag, metric, value) rows via `stack` — Spark's UNPIVOT
   * primitive, a generator expression that never shuffles (the melt
   * happens wherever the aggregate row already lives). Values are
   * exact decimal sums surfaced as doubles, the money discipline.
   */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: String) = col(c).cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_price"),
        sum(dec("l_discount")).cast("double").as("sum_disc"))
      .selectExpr("l_returnflag",
        "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, " +
          "'sum_disc', sum_disc) AS (metric, val)")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /**
   * Event-type transition matrix: counts (and row-normalized
   * probabilities) of consecutive event-type pairs per user timeline —
   * the Markov-chain view of the event stream. One window pass
   * partitioned by user (single shuffle) + one small pair aggregate;
   * probability is a single integer division.
   */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(fromTotals, "event_type")
      .select(col("event_type"), col("next_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from")).as("p"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /**
   * Incremental aggregate maintenance (materialized-view delta
   * update): the maintained per-customer order stats are refreshed by
   * merging the STORED aggregate state with the delta batch's partial
   * aggregate — the base FACTS are never rescanned. This is the
   * mergeable-state identity every Spark partial aggregation already
   * relies on, surfaced as an operator: counts add, decimal sums add
   * (exactly — which is why the merged result is bit-identical to the
   * full recompute the oracle performs). At 100 TB the delta pass
   * touches only the new partition; the state table is |keys| rows.
   */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def partial(df: DataFrame) = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    // fixture split: 90% "already ingested" state, 10% arriving delta
    val state = partial(orders.filter(pmod(col("o_orderkey"), lit(10L)) =!= 0L))
    val delta = partial(orders.filter(pmod(col("o_orderkey"), lit(10L)) === 0L))
    state.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("total")).cast("double").as("total"))
      .orderBy(col("o_custkey"))
  }

  /**
   * Winsorization: per-segment p05/p95 clipping of account balances —
   * the standard outlier treatment before averaging. The clip bounds
   * come from [[graft.ops.GlobalOrder.groupedQuantiles]] (exact
   * quantile_cont interpolation via grouped global ranks), NOT the
   * builtin `percentile()` whose TypedImperativeAggregate ships every
   * balance into segment-cardinality reducers (the few-key ceiling,
   * Relational2.percentiles scaladoc). The segment-bounds table is
   * categorical-cardinality, so the join back is an AQE broadcast;
   * clipped values re-enter exact decimal sums (the interpolated bound
   * is a double both engines produce bit-identically, so its decimal
   * rounding agrees too).
   */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val bounds = graft.ops.GlobalOrder.groupedQuantiles(
      c, keyCols = Seq("c_mktsegment"), valueCol = "c_acctbal",
      ps = Seq(("p05", 0.05), ("p95", 0.95)))
    c.join(bounds, "c_mktsegment")
      .withColumn("clipped", least(greatest(col("c_acctbal"), col("p05")), col("p95")))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("c_acctbal") < col("p05"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(col("c_acctbal") > col("p95"), 1L).otherwise(0L)).as("n_clipped_high"),
        min(col("p05")).as("p05"),
        max(col("p95")).as("p95"),
        sum(col("clipped").cast("decimal(18,2)")).cast("double").as("sum_winsorized"))
      .orderBy(col("c_mktsegment"))
  }

  /**
   * Fuzzy (edit-distance) self-join over part names — near-miss pairs
   * within the same (brand, size) at levenshtein ≤ `maxDist`.
   *
   * Blocking is the whole game at scale. Round 10 blocked on
   * (brand, size) alone — a FIXED key space (~25×50), so block
   * population grows linearly with data and within-block candidate
   * pairs grow QUADRATICALLY (measured 7.1× per 10× data, the one
   * superlinear slope in the tri-scale audit). This version applies
   * the standard approximate-string-join filters so candidates scale
   * with true near-miss density instead:
   *
   *  - LENGTH BAND: ed(a,b) ≤ d ⟹ |len(a) − len(b)| ≤ d (an insert/
   *    delete moves length by 1, a substitution by 0).
   *  - PREFIX-FILTERED q-GRAM SIGNATURES (Gravano et al. VLDB'01 count
   *    filter + the AllPairs/PPJoin prefix filter, as in ED-Join):
   *    ed(a,b) ≤ d ⟹ the positional q-gram bags share ≥
   *    max(|Ga|,|Gb|) − d·q elements (each edit touches ≤ q grams),
   *    where |G| = len − q + 1 and bags are set-encoded as
   *    (gram, occurrence#). By the prefix-filter lemma, under ANY
   *    fixed global element order the first d·q + 1 elements of each
   *    side must then intersect — so the equi-join key is
   *    (brand, size, gram, occ) restricted to each name's d·q + 1
   *    RAREST grams (global-frequency order). A hot gram is almost
   *    never among anyone's rarest, so it almost never becomes a
   *    blocking key: candidate volume tracks how many names actually
   *    share rare substrings, i.e. near-miss density, not block
   *    population squared.
   *
   * The lemma needs max(|Ga|,|Gb|) − d·q ≥ 1, i.e. the longer name ≥
   * d·q + q chars; DEGENERATE-SHORT pairs (BOTH names shorter) fall
   * back to the (brand, size) block — strings that short are a
   * bounded-cardinality population over any alphabet and carry ≤
   * (d+1)·q−1 chars of signal, so the fallback arm stays sliver-sized
   * at any corpus scale (empty on this fixture: min name length 7).
   * Both filters are IMPLIED by ed ≤ d, so the result is exactly the
   * declarative oracle's — the spec pins equality against the naive
   * block join.
   *
   * `maxDist` default is 2: fixture names are 7–12 chars, so the old
   * default of 20 was vacuous (max observed distance 11) — at ≤ 2 the
   * join means "near-miss", not "same block".
   *
   * Signature selection runs through [[graft.plans.TopK.perKey]]
   * (map-side bounded heap), so the rarity cut never windows or sorts
   * the gram table. The signature table itself is a STORED artifact
   * ([[graft.llm.ModelCache.memoIndex]], tag `fuzzy-sig`): an
   * entity-resolution deployment signs the catalog once and serves
   * every join from the stored blocking index — the signing pass
   * lands in the bench build ledger like every other index, and serve
   * is just the signature equi-join plus the verify.
   */
  def fuzzyJoin(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame = {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    val sig = graft.llm.ModelCache.memoIndex(parts, s"fuzzy-sig|$maxDist") {
      graft.ops.GlobalOrder.pin(signatureTable(parts, maxDist))
    }
    fuzzyJoinAssemble(parts, sig, maxDist)
  }

  /** Spec entry point over an arbitrary frame — no memo (the key
    * discipline: only file-backed corpora cache), fresh signatures. */
  private[graft] def fuzzyJoinOf(parts: DataFrame, maxDist: Int): DataFrame =
    fuzzyJoinAssemble(parts, signatureTable(parts, maxDist), maxDist)

  /** The prefix-filter blocking index: each name's `maxDist·q + 1`
    * rarest positional q-grams (see [[fuzzyJoin]]'s scaladoc for the
    * lemma). One row per (name, signature element). */
  private[graft] def signatureTable(parts: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    signaturesFromElements(signatureElements(parts), maxDist)
  }

  /** The ROW-LOCAL half of the signature build: positional (gram, occ)
    * elements per name. occ (index among equal grams in the same name)
    * set-encodes the bag so bag intersection = set intersection.
    * An O(len²) array fold over a name-length array, no window, no
    * shuffle — which is why the streamed `fuzzy-sig` store
    * ([[graft.streaming.ArtifactMaintenance.fuzzySigArtifact]]) commits
    * per-batch concatenations of exactly this projection: elements are
    * maxDist-INDEPENDENT (only the selection below depends on it), so
    * one element store serves every distance. Names shorter than q
    * have no grams and are handled by the degenerate-short arm (their
    * band-compatible partners are short too). */
  private[graft] def signatureElements(parts: DataFrame): DataFrame = {
    val q = 2 // gram width
    parts.select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("p_name"), length(col("p_name")).cast("int").as("len"))
      .filter(col("len") >= q)
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"),
        col("len"),
        explode(expr(
          s"""transform(sequence(1, len - ${q - 1}), i -> struct(
             |  substring(p_name, i, $q) AS gram,
             |  size(filter(sequence(1, i - 1),
             |       j -> substring(p_name, j, $q) = substring(p_name, i, $q)))
             |    AS occ))""".stripMargin)).as("e"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"),
        col("len"), col("e.gram").as("gram"), col("e.occ").as("occ"))
  }

  /** The GLOBAL half: rank grams by corpus-wide rarity and keep each
    * name's `maxDist·q + 1` rarest elements. Split from
    * [[signatureElements]] because the rarity order is a corpus
    * aggregate — it legitimately shifts as documents arrive, so the
    * streamed store keeps ELEMENTS and re-derives the selection at
    * serve (one mergeable count + a bounded-heap top-k, no raw-text
    * rescan). */
  private[graft] def signaturesFromElements(
      elems: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val q = 2                        // gram width
    val sigLen = maxDist * q + 1     // prefix-filter signature size

    // global gram rarity — only the ORDER matters for losslessness
    // (any consistent total order satisfies the lemma); rarity is the
    // performance choice that keeps hot grams out of signatures.
    // perKey's boolean means DESCENDING, so rarest-first is gfreq
    // ASCENDING (false) — descending here would make the hottest
    // grams the blocking keys and re-admit the quadratic candidate
    // growth this re-blocking exists to eliminate (still lossless,
    // but the scale fix would be gone; SignatureRarestGramSpec pins it).
    val freq = elems.groupBy(col("gram")).agg(count(lit(1)).as("gfreq"))
    graft.plans.TopK.perKey(
      elems.join(freq, Seq("gram")),
      keys = Seq("p_partkey"),
      order = Seq(("gfreq", false), ("gram", false), ("occ", false)),
      k = sigLen)
  }

  /** The fuzzy join served from an ALREADY-BUILT signature table (the
    * memoized `fuzzy-sig` index or one derived from the streamed
    * element store) — the serve path a deployment runs per query. */
  private[graft] def fuzzyJoinFromSignatures(
      parts: DataFrame, sig: DataFrame, maxDist: Int): DataFrame =
    fuzzyJoinAssemble(parts, sig, maxDist)

  private def fuzzyJoinAssemble(
      parts: DataFrame, sig: DataFrame, maxDist: Int): DataFrame = {
    val q = 2
    val longMin = maxDist * q + q    // min length where the lemma bites
    val p = parts.select(col("p_partkey"), col("p_brand"), col("p_size"),
      col("p_name"), length(col("p_name")).cast("int").as("len"))

    def side(s: String) = sig.select(
      col("p_partkey").as(s"key_$s"), col("p_brand"), col("p_size"),
      col("p_name").as(s"name_$s"), col("len").as(s"len_$s"),
      col("gram"), col("occ"))
    val longPairs = side("a").join(side("b"), Seq("p_brand", "p_size", "gram", "occ"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist &&
        greatest(col("len_a"), col("len_b")) >= longMin)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        col("name_a"), col("name_b"))
      .distinct() // a pair may share several signature elements

    // degenerate-short arm: both names < longMin chars (see scaladoc)
    def shortSide(s: String) = p.filter(col("len") < longMin).select(
      col("p_partkey").as(s"key_$s"), col("p_brand"), col("p_size"),
      col("p_name").as(s"name_$s"), col("len").as(s"len_$s"))
    val shortPairs = shortSide("a").join(shortSide("b"), Seq("p_brand", "p_size"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        col("name_a"), col("name_b"))

    longPairs.unionByName(shortPairs)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("key_a"), col("key_b"))
  }

  /**
   * Trailing-window z-score anomaly detection: for each event, the
   * z-score of its value against the preceding 100 events of the same
   * type; emit the |z| > 2.5 anomalies.
   *
   * Parity discipline: mean and variance come from EXACT DECIMAL
   * window sums (Σv and Σv² over the same frame) — decimal addition is
   * associative, so the result is independent of Spark's intra-frame
   * evaluation order — and only the final mean/var/z expressions drop
   * to doubles, in a fixed operation order the oracle mirrors token
   * for token (identical-order double chains are bit-exact across
   * engines; accumulating doubles inside the window would not be).
   *
   * Plan: the trailing sums come from
   * [[graft.ops.GlobalOrder.groupedTrailingSums]] — an exact seeded
   * ring buffer over range-partitioned data. Three formulations of
   * the same frame, in descending cost: Spark's window re-aggregates
   * the bounded `ROWS -100,-1` frame from scratch per row
   * (O(frame)/row, no retraction) AND caps parallelism at the
   * event_type cardinality (~10 reducer tasks); the prefix-difference
   * trick (`P(r) − P(r−100)`) fixes both but needs a self equi-join
   * that exchanges the table twice more; the seeded ring buffer is
   * O(1)/row with ONE exchange total — segment boundary seeds are
   * frame × segments scalars, metadata-size. Decimal add and evict
   * are exact, so the running frame sum is bit-identical to the
   * window's re-aggregation — the oracle keeps the framed window
   * formulation and still hash-matches (deliberately: two
   * formulations, one answer).
   *
   * Widening discipline unchanged: summing the (28,2)/(28,4)-cast
   * inputs accumulates at (38,2)/(38,4) — a 10^12-row key's
   * cumulative total cannot silently overflow to NULL. Bounds:
   * |v| ≤ 10^12 (v² fits (28,4)), Σ ≤ 10^34 per key.
   */
  def windowZScore(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value").cast("decimal(18,2)")
    // pinned: the range partitioner's sampling pass plus the shuffle
    // pass would otherwise scan + timestamp-parse the events table twice
    graft.ops.GlobalOrder.groupedTrailingSums(
      graft.ops.GlobalOrder.pin(Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          Tables.epochMs(col("ts")).as("ts_ms"))),
      keys = Seq(col("event_type")),
      order = Seq(col("ts_ms"), col("event_id")),
      values = Seq(
        (v.cast("decimal(28,2)"), "s1"),
        ((v * v).cast("decimal(28,4)"), "s2")),
      frame = 100)
      .withColumn("n", least(col("g_rank") - 1L, lit(100L)))
      .filter(col("n") >= 30)
      // NULLIF guards (the bpeTokenStats discipline): without the
      // window in the plan, Catalyst pushes the later variance/z
      // predicates down and may evaluate these divisions on rows the
      // n >= 30 filter discards — under ANSI that's a DIVIDE_BY_ZERO
      // on n = 0 rows. Guarded, those rows yield NULL (then filter
      // false); surviving rows divide by the same nonzero values.
      .withColumn("mean", col("s1").cast("double") / nullif(col("n"), lit(0L)))
      .withColumn("variance",
        (col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / nullif(col("n"), lit(0L)))
          / nullif(col("n") - 1, lit(0L)))
      .filter(col("variance") > 0.0)
      .withColumn("z",
        (col("value").cast("decimal(18,2)").cast("double") - col("mean"))
          / nullif(sqrt(col("variance")), lit(0.0)))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"), col("ts_ms"),
        col("value"), col("z"))
      .orderBy(col("event_id"))
  }
}
