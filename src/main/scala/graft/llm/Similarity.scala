package graft.llm

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table
 * (`embedding: ArrayType(FloatType)`, 64-dim).
 *
 * Numeric contract: all vector math widens each float element to DOUBLE
 * *before* multiplying, and folds left-to-right — bit-identical to
 * DuckDB's `list_sum(list_transform(...))` over the same arrays (verified
 * empirically), so even the similarity values hash-match the oracle.
 *
 * Scale design:
 *  - brute-force top-k broadcasts the (small) query set against the
 *    corpus — one pass over the corpus, per-partition top-k heap via
 *    window rank; at 1000 executors this is the classic "scan the
 *    embedding shards once" shape;
 *  - the LSH variant buckets by random-hyperplane sign bits so each
 *    query only meets its bucket; hyperplane components are md5-derived
 *    (deterministic, no RNG).
 */
object Similarity {

  /** Sequential-double dot product of two float-array columns — the
    * codegen'd [[graft.functions.DotProductD]] expression (bit-identical
    * to the HOF `aggregate(zip_with(...))` fold, ~10× faster). */
  private[llm] def dotD(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_d(a, b)

  private[llm] def norm2(a: Column): Column = dotD(a, a)

  /** Corpus with precomputed squared norm. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("n2", norm2(col("embedding")))

  /** Hard ceiling on brute-force query-set size: `vec_id % 20 == 0`
    * alone grows linearly with the corpus, which would eventually
    * overflow the query-set broadcast; the id cap fixes the set at
    * ≤ [[MaxBruteQueries]] rows no matter the corpus (a no-op at the
    * fixture SFs, whose ids all sit below the cap). */
  val MaxBruteQueries = 256

  /**
   * Brute-force cosine top-k: every 20th vector among the first
   * `20 · MaxBruteQueries` ids queries the full corpus (self excluded),
   * k=10. One scan of the embedding shards against a constant-size
   * broadcast — the oracle-checkable ground-truth twin of the ANN
   * paths (q36/q52), bounded the same way q31 bounds exact Jaccard.
   */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    cosineTopKOf(Tables.embeddings(spark, dir), k)

  /** [[cosineTopK]] over an explicit corpus DataFrame
    * (`vec_id`, `embedding`) — the planted-recall certification runs
    * the same exact baseline over an augmented corpus. */
  private[llm] def cosineTopKOf(emb0: DataFrame, k: Int): DataFrame = {
    val emb = withNorm(emb0)
    val queries = emb
      .filter(pmod(col("vec_id"), lit(20)) === 0 &&
        col("vec_id") < lit(20L * MaxBruteQueries))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val joined = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        dotD(col("q_emb"), col("embedding")) /
          (sqrt(col("q_n2")) * sqrt(col("n2"))))
    // rank-emitting bounded-heap top-k: the corpus×queries candidate set
    // never shuffles to per-query reducers (the row_number window would
    // move and fully sort all of it); only ≤ k·queries·partitions
    // survivor rows cross the exchange
    graft.plans.TopK.perKeyWithRank(joined,
        Seq("q_id"), Seq(("sim", true), ("vec_id", false)), k, "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /**
   * ANN recall audit — recall@k of the LSH index ([[annLsh]]) against
   * the exact brute-force baseline ([[cosineTopK]]) over the same
   * bounded query set: the index-quality measurement every
   * approximate-similarity deployment runs before trusting the scale
   * path. Per query: how many of the exact top-k the bucket-restricted
   * ANN also returned. Both sides carry deterministic
   * (sim DESC, neighbor_id) tiebreaks and bit-exact double sims
   * (q34/q36 both hash-match DuckDB), so the intersection count — and
   * thus recall — is oracle-exact, not approximate-compared.
   *
   * Plan: re-runs the two ranked pipelines (queries are independent by
   * the driver contract), semi-joins exact hits against ANN results on
   * (q_id, neighbor_id), and aggregates per query — the recall join
   * moves only k·queries rows.
   *
   * Expect LOW recall on the synthetic fixture: its embeddings are
   * near-random, so cosine "neighbors" are marginal and a single-probe
   * sign-LSH bucket rarely contains them — which is precisely the
   * situation this audit exists to expose before a deployment trusts
   * the approximate path. On clustered real-world embeddings the same
   * index scores far higher; raising recall = multi-probe (flip
   * low-margin bits) or the IVF route's nprobe > 1 (q52).
   */
  def annRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallVsExact(spark, dir, k, annLsh(spark, dir, k))

  /** Shared recall@k join: exact top-k vs an approximate result
    * restricted to the same bounded query set; emits per-query
    * (n_exact, n_hit, recall). The join moves only k·queries rows. */
  private def recallVsExact(spark: SparkSession, dir: String, k: Int,
      approx: DataFrame): DataFrame =
    recallVsExactOf(Tables.embeddings(spark, dir), k, approx)

  private def recallVsExactOf(corpus: DataFrame, k: Int,
      approx: DataFrame): DataFrame = {
    // NOT pinned, deliberately (r18): exact feeds two consumers, but a
    // same-session A/B measured a pin +15–60% SLOWER across the whole
    // recall family — Spark's exchange reuse already dedups the
    // brute-force subtree, and the pin only adds an eager barrier that
    // blocks the independent ANN/exact stages from overlapping.
    val exact = cosineTopKOf(corpus, k)
      .select(col("q_id"), col("neighbor_id"))
    val ann = approx
      .filter(pmod(col("q_id"), lit(20)) === 0 &&
        col("q_id") < lit(20L * MaxBruteQueries))
      .select(col("q_id"), col("neighbor_id"))
    val hits = exact.join(ann, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
      .orderBy(col("q_id"))
  }

  /**
   * Matryoshka truncation audit (Kusupati et al. 2022): recall@k of
   * cosine top-k computed on the FIRST `dims` dimensions against the
   * full-dimension exact baseline, over the same bounded query set as
   * the other recall audits. This is the measurement behind the
   * "store half the vector" storage play — at 100 TB an embedding
   * column is the widest thing in the lake, and truncating it halves
   * scan bytes and doubles ANN fanout IF the recall holds; this query
   * is the go/no-go number for that decision.
   *
   * Both rankings run the same bounded brute-force pipeline
   * ([[cosineTopKOf]]): the truncated corpus is a row-local
   * `slice(embedding, 1, dims)` projection — no second storage copy —
   * and the recall join moves only k·queries rows.
   */
  def matryoshkaRecall(spark: SparkSession, dir: String,
      k: Int = 5, dims: Int = 32): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val trunc = emb.select(col("vec_id"),
      slice(col("embedding"), 1, dims).as("embedding"))
    recallVsExactOf(emb, k, cosineTopKOf(trunc, k))
  }

  /**
   * Uint8-quantization recall audit — the q194 measurement for the
   * OTHER storage play: recall@k of cosine top-k over the q93
   * per-dimension min/max uint8 codec against the full-precision
   * exact baseline. Together with [[matryoshkaRecall]] this prices
   * the two standard embedding-compression axes (fewer dims vs fewer
   * bits) on one comparable number.
   *
   * The quantized corpus is a row-local `transform` against the
   * 64-entry min/max literals (a bounded model read, the KMeans
   * pattern) — no explode, no join, so at scale quantization is a
   * pure map over the embedding shards. Quantized values are small
   * exact integers, so their dots and norms are exact and the cosine
   * is the same single division both engines compute.
   */
  def quantRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    recallVsExactOf(emb, k, cosineTopKOf(quantizedVectors(emb), k))
  }

  /** The q93 codec as full vectors: per-dim global min/max (computed
    * once, folded into literals), then `floor(ratio·255 + 0.5)` per
    * element — [[graft.llm.Pipeline.quantizeEmbeddings]]'s exact
    * arithmetic, re-emitted as arrays for similarity search. */
  private[llm] def quantizedVectors(emb: DataFrame): DataFrame = {
    val stats = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Double]("mn"), r.getAs[Double]("mx")))
      .sortBy(_._1)
    val mnArr = array(stats.map(s => lit(s._2)): _*)
    val mxArr = array(stats.map(s => lit(s._3)): _*)
    emb.select(col("vec_id"), col("embedding"),
        mnArr.as("mn"), mxArr.as("mx"))
      .select(col("vec_id"), expr(
        """transform(embedding, (v, i) ->
          |  CAST(floor((CASE WHEN element_at(mx, i + 1) = element_at(mn, i + 1)
          |                   THEN 0.0D
          |                   ELSE (CAST(v AS DOUBLE) - element_at(mn, i + 1))
          |                        / (element_at(mx, i + 1) - element_at(mn, i + 1))
          |              END) * 255.0D + 0.5D) AS FLOAT))""".stripMargin)
        .as("embedding"))
  }

  /** Recall@k of the IVF route ([[graft.llm.Pipeline.ivfAnn]], q52)
    * against the exact baseline — the third audit in the family
    * (q149 single-probe LSH, q150 multi-probe LSH, q151 IVF), so the
    * three index strategies are comparable on one measurement. */
  def ivfRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallVsExact(spark, dir, k, graft.llm.Pipeline.ivfAnn(spark, dir, k))

  /** Recall@k of the PQ retrieve-rerank route ([[graft.llm.PQ.pqAnn]],
    * q158) against the exact baseline — the compression axis joins the
    * audit family (q149 single-probe LSH, q150 multi-probe, q151 IVF),
    * measuring exactly what the 64× residency cut costs in recall at
    * the chosen shortlist depth. */
  def pqRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallVsExact(spark, dir, k, PQ.pqAnn(spark, dir, k))

  /** Planted-corpus PQ certification (spec-driven, the q154 pattern
    * applied to the compression axis): train + encode over
    * [[plantedCorpus]] and measure recall of the planted true
    * neighbors. Planted vectors sit [[PlantedEps]]-close to their
    * anchors, far inside a quantization cell, so they encode to the
    * anchor's codes and survive the ADC shortlist — the spec asserts
    * the recall bound that certifies the compressed index finds true
    * near-neighbors when they exist. */
  private[llm] def plantedPqRecall(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val corpus = plantedCorpus(spark, dir)
    recallVsExactOf(corpus, k, PQ.pqAnnOf(corpus, k, PQ.Shortlist))
  }

  /** Recall@k of the composed IVF × PQ route ([[graft.llm.PQ.ivfPqAnn]],
    * q160) against the exact baseline — completes the audit family
    * (LSH q149/q150, IVF q151, PQ q159) with the production
    * composition, so the combined cost of cell pruning AND code
    * compression is measured on the same scale as each axis alone. */
  def ivfPqRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallVsExact(spark, dir, k, PQ.ivfPqAnn(spark, dir, k))

  /** Planted-corpus certification of the composed IVF × PQ index:
    * planted vectors land in their anchor's coarse cell AND encode to
    * its codes (eps is far inside both quantizers' cells), so they
    * survive the probe + shortlist; the spec asserts the recall bound
    * for the full composition. */
  private[llm] def plantedIvfPqRecall(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val corpus = plantedCorpus(spark, dir)
    recallVsExactOf(corpus, k, PQ.ivfPqAnnOf(corpus, k, PQ.Shortlist))
  }

  /** Recall@k of the RESIDUAL-coded route ([[graft.llm.PQ.ivfRpqAnn]],
    * q261) against the exact baseline — the measurement the global-vs-
    * residual codebook decision (q160's documented divergence) needs:
    * same index bytes, same probe/shortlist budget, read beside q161's
    * number to see what residual encoding buys on this corpus. */
  def ivfRpqRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallVsExact(spark, dir, k, PQ.ivfRpqAnn(spark, dir, k))

  /** Planted-corpus certification of the residual-coded index: a
    * planted vector shares its anchor's coarse cell, so its residual
    * is eps-close to the anchor's residual and encodes to the same
    * codes — it must survive the probe + ADC shortlist. */
  private[llm] def plantedIvfRpqRecall(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val corpus = plantedCorpus(spark, dir)
    recallVsExactOf(corpus, k, PQ.ivfRpqAnnOf(corpus, k, PQ.Shortlist))
  }

  /** Probe-bucket list for multi-probe LSH: the query's own bucket
    * plus `probes − 1` single-bit flips at the LOWEST-margin planes
    * (|dot| smallest ⇒ the hyperplanes the vector most nearly
    * straddles ⇒ the buckets its true neighbors most likely landed
    * in). Margin ties break on plane index — deterministic and
    * oracle-replayable like everything else in the plane family. The
    * flip buckets are pairwise distinct and distinct from the base, so
    * a (query, neighbor) candidate pair can never arise twice. */
  private[llm] def probeBuckets(emb: Column, bits: Int, probes: Int): Column = {
    val base = lshKey(emb, bits)
    if (probes <= 1) array(base)
    else {
      val margins = array((0 until bits).map { p =>
        val planeLit = array(planes(p).map(lit(_)): _*).cast("array<float>")
        struct(abs(dotD(emb, planeLit)).as("m"), lit(p).as("p"))
      }: _*)
      val sorted = array_sort(margins)
      val flips = (0 until probes - 1).map { i =>
        base.bitwiseXOR(
          pow(lit(2.0), element_at(sorted, i + 1).getField("p").cast("double"))
            .cast("long"))
      }
      array(base +: flips: _*)
    }
  }

  /**
   * Multi-probe LSH ANN: [[annLsh]] with each query additionally
   * probing the `probes − 1` buckets reachable by flipping its
   * lowest-margin sign bits — the standard recall lever for
   * single-table sign LSH (measured here: recall@5 on the fixture
   * rises ~3.5× from single-probe at 3 probes). Cost scales linearly
   * in `probes` (each probe is one more bucket's candidates) while the
   * index itself is unchanged — no extra tables, no wider signatures;
   * the bucket join stays the only exchange.
   */
  def annLshMultiProbe(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 3, bitsIn: Int = -1): DataFrame = {
    val bits =
      if (bitsIn > 0) bitsIn
      else lshBitsFor(Tables.parquetRowCount(spark, s"$dir/embeddings.parquet"))
    annLshMultiProbeOf(Tables.embeddings(spark, dir), k, probes, bits)
  }

  /** [[annLshMultiProbe]] over an explicit corpus DataFrame with an
    * explicit bit count (index-build metadata is the caller's at this
    * layer). */
  private[llm] def annLshMultiProbeOf(emb0: DataFrame, k: Int,
      probes: Int, bits: Int): DataFrame = {
    val emb = withNorm(emb0)
    val a = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("n2").as("q_n2"),
      explode(probeBuckets(col("embedding"), bits, probes)).as("bucket"))
    val b = emb.select(lshKey(col("embedding"), bits).as("bucket"),
      col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
      col("n2").as("n_n2"))
    a.join(b, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("sim",
        dotD(col("q_emb"), col("n_emb")) / (sqrt(col("q_n2")) * sqrt(col("n_n2"))))
      .transform(j => graft.plans.TopK.perKeyWithRank(j,
        Seq("q_id"), Seq(("sim", true), ("neighbor_id", false)), k, "rnk"))
      .select(col("q_id"), col("rnk"), col("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Recall@k of [[annLshMultiProbe]] against the exact baseline —
    * [[annRecall]]'s measurement applied to the multi-probe index, so
    * q149 vs q150 quantifies exactly what the extra probes buy. */
  def multiProbeRecall(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 3): DataFrame =
    recallVsExact(spark, dir, k, annLshMultiProbe(spark, dir, k, probes))

  /** Planted neighbors per anchor; equals the audit family's k so the
    * exact top-k of every anchor is exactly its planted set. */
  val PlantedPerAnchor = 5

  /** Id offset for planted vectors — far above any fixture vec_id, so
    * planted rows never collide with (or get selected as) queries. */
  val PlantedBase = 1000000L

  /**
   * Planted perturbation step: DYADIC (2⁻¹⁴), so
   * `eps × (md5Byte − 128)` is an exact double (an integer scaled by a
   * power of two, well inside the 53-bit mantissa) in BOTH engines —
   * a decimal literal like 0.0001 would round differently under
   * DuckDB's literal-is-DECIMAL arithmetic than under Spark's
   * double-literal arithmetic, and the planted embeddings would stop
   * hash-matching. At this step the planted cosine is ≈ 0.9994
   * (perturbation norm ≈ 0.036 on unit-norm fixture vectors) and the
   * per-plane sign-flip probability is ~1%, which is what makes the
   * certification bound achievable by construction.
   */
  val PlantedEps: Double = 1.0 / 16384

  /**
   * The base corpus plus [[PlantedPerAnchor]] planted near-neighbors
   * for every audit-family anchor (the `vec_id % 20 == 0` bounded
   * query set): planted vector j of anchor a has id
   * `PlantedBase + a·P + j` and embedding
   * `anchor[d] + PlantedEps · (md5Byte("plant|a|j|d") − 128)` — an
   * md5-disciplined perturbation, no RNG, replayable verbatim in the
   * DuckDB oracle. Planted rows are anchor-set-sized (≤ P × queries),
   * so the augmentation is metadata-scale at any corpus size.
   */
  private[llm] def plantedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val anchors = emb
      .filter(pmod(col("vec_id"), lit(20)) === 0 &&
        col("vec_id") < lit(20L * MaxBruteQueries))
    val js = spark.range(PlantedPerAnchor.toLong).select(col("id").as("j"))
    val planted = anchors.crossJoin(js)
      .select(
        (lit(PlantedBase) + col("vec_id") * lit(PlantedPerAnchor.toLong) + col("j"))
          .as("p_id"),
        transform(col("embedding"), (x, d) =>
          (x.cast("double") +
            (conv(substring(md5(concat(lit("plant|"), col("vec_id"), lit("|"),
              col("j"), lit("|"), d)), 1, 2), 16, 10).cast("int") - 128)
              .cast("double") / lit(16384.0) // exact: integer / 2^14 is dyadic
          ).cast("float")).as("p_emb"))
      .select(col("p_id").as("vec_id"), col("p_emb").as("embedding"))
    emb.unionByName(planted)
  }

  /**
   * Planted-neighbor recall CERTIFICATION (q154): the q150 multi-probe
   * measurement run over [[plantedCorpus]]. The fixture's own
   * embeddings are near-random, so q149–q151 can only report low
   * recall "by construction" — they detect a broken index but cannot
   * certify a working one. Here every anchor gets
   * [[PlantedPerAnchor]] = k planted neighbors at cosine ≈ 0.9994
   * (≫ the ~0.5 background max), so the exact top-k IS the planted
   * set and recall measures exactly "does the index find true
   * near-neighbors when they exist" — the spec asserts it ≥ 0.9 at
   * the family's operating point (3 probes), certifying the index
   * rather than measuring fixture noise.
   *
   * Index bits are sized from the BASE corpus footer (the planted
   * rows are anchor-set-sized — they don't move the sizing ladder),
   * matching the oracle's `COUNT(*) FROM embeddings`.
   */
  def plantedRecall(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 3): DataFrame = {
    val bits = lshBitsFor(Tables.parquetRowCount(spark, s"$dir/embeddings.parquet"))
    val corpus = plantedCorpus(spark, dir)
    recallVsExactOf(corpus, k, annLshMultiProbeOf(corpus, k, probes, bits))
  }

  /** Anchor-window bound for the exact near-dup ground truth: pairs
    * are anchored on the first [[NearDupAnchor]] ids, so the exact scan
    * is anchor × corpus — LINEAR in corpus size, like q31's bounded
    * exact Jaccard. A no-op at sf0.01 (all ids below the anchor). */
  val NearDupAnchor = 1000L

  /** Embedding-cosine near-duplicate pairs with cosine ≥ threshold,
    * anchored on a fixed id window (the lower id of every reported
    * pair is < [[NearDupAnchor]]). Exact ground-truth twin of the LSH
    * route (q36), which is the unbounded scale path. */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.45): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir))
    val a = emb.filter(col("vec_id") < NearDupAnchor)
      .select(col("vec_id").as("id_a"), col("embedding").as("e_a"), col("n2").as("n2_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"), col("n2").as("n2_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim",
        dotD(col("e_a"), col("e_b")) / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
      // pin before the presentation sort: the anchor×corpus dot-product
      // sweep would otherwise run twice (range-sampler pass, guide §2.4)
      .transform(d => graft.ops.GlobalOrder.pinnedSort(
        d, col("id_a"), col("id_b")))
  }

  /** Target mean LSH bucket width: the corpus-over-buckets ratio the
    * index aims for. In-bucket work is ΣN_b² ≈ N·width, so holding
    * width constant keeps the self-join LINEAR in corpus size. */
  val TargetBucketWidth = 64

  /** Hyperplane budget: 2^20 buckets ≈ 67M-vector corpora at width 64;
    * raise for more (each extra bit doubles capacity). */
  val MaxLshBits = 20

  /**
   * Corpus-dependent sign-bit count: the smallest b in
   * [8, MaxLshBits] with n / 2^b ≤ TargetBucketWidth. Fixed bucket
   * counts were round 2's scale defect — ΣN_b² ≈ N²/2^bits is
   * quadratic again at 100× when bits don't grow. Pure integer
   * comparisons so the DuckDB oracle replays it from COUNT(*) with no
   * floating log2 (ln is not portable across libm implementations).
   */
  def lshBitsFor(n: Long): Int =
    (8 until MaxLshBits).foldLeft(8) { (b, j) =>
      b + (if (n > (TargetBucketWidth.toLong << j)) 1 else 0)
    }

  /**
   * Deterministic pseudo-random hyperplanes: component (p, d) is an
   * md5-derived integer in [-128, 127]. No RNG — replayable anywhere.
   * Computed once driver-side (they're constants) and shipped as array
   * literals, so the per-row work is just [[DotProductD]] projections.
   */
  private[llm] lazy val planes: Seq[Array[Float]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until MaxLshBits).map { p =>
      Array.tabulate(64) { d =>
        val hex = digest.digest(s"plane$p|$d".getBytes("UTF-8"))
          .take(1).map(b => f"$b%02x").mkString
        (Integer.parseInt(hex, 16) - 128).toFloat
      }
    }
  }

  /** Sign bit of embedding · hyperplane(p). */
  private def signBit(emb: Column, p: Int): Column = {
    val planeLit = array(planes(p).map(lit(_)): _*).cast("array<float>")
    when(dotD(emb, planeLit) >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** LSH bucket key: the packed sign bits (lowest `bits` planes). */
  private[llm] def lshKey(emb: Column, bits: Int): Column =
    (0 until bits).map(p => signBit(emb, p) * lit(1L << p)).reduce(_ + _)

  /**
   * Bucketed approximate nearest neighbors: group vectors by
   * random-hyperplane signature, rank neighbors within each bucket.
   * The sign-bit count grows with the corpus ([[lshBitsFor]]), holding
   * expected bucket width at [[TargetBucketWidth]] — so the in-bucket
   * self-join stays linear in corpus size at any scale. The corpus is
   * deliberately NOT cached: at 100 TB the working set never fits, and
   * recomputing `bits` dot products per side is cheaper than the spill.
   *
   * `bits` is index-build-time metadata: by default it is derived from
   * the parquet footer row count ([[Tables.parquetRowCount]] — a
   * driver-side metadata read, NO Spark job over the embedding store;
   * round 5 ran a full `count()` here) and can be threaded in
   * explicitly by callers that maintain their own index catalog.
   */
  /**
   * SEMANTIC decontamination — the embedding-based member of the
   * decontamination family (q91 exact n-gram, q109 graded containment,
   * q163 winnowing fingerprints, q229 cluster-closed): a training
   * vector is contaminated when its cosine to ANY held-out eval vector
   * reaches τ, catching the paraphrase/reformat drift every lexical
   * screen misses (the reason production pipelines run an embedding
   * screen beside the n-gram one). Eval slice = the family's bounded
   * query-set convention. Output: every training vector with its
   * NEAREST eval doc (deterministic sim-desc/eval_id tiebreak via the
   * rank-emitting bounded heap, never a window), the exact max
   * similarity, and the τ verdict — graded evidence, not just a flag.
   *
   * τ = 0.3125 (dyadic 5/16 — exact in double in both engines, the
   * q162 threshold discipline).
   *
   * Scale shape: eval suites are benchmark-sized by nature, so the
   * eval side BROADCASTS (MBs against 100 TB of training vectors) and
   * the whole screen is ONE corpus scan with row-local dot products —
   * the same asymmetric-join stance as q163; exactness is the point
   * (an IVF-pruned variant would miss the marginal cosines this screen
   * exists to catch), so the scan is deliberate, not a shortcut.
   */
  def semanticDecontaminate(spark: SparkSession, dir: String,
      tau: Double = 0.3125): DataFrame =
    semanticDecontaminateOf(Tables.embeddings(spark, dir), tau)

  /** [[semanticDecontaminate]] over an explicit (vec_id, embedding)
    * frame — the spec plants an eval near-copy among training rows. */
  private[llm] def semanticDecontaminateOf(emb0: DataFrame,
      tau: Double): DataFrame = {
    val emb = withNorm(emb0)
    val isEval = pmod(col("vec_id"), lit(20)) === 0 &&
      col("vec_id") < lit(20L * MaxBruteQueries)
    val evalV = emb.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"))
    val joined = emb.filter(!isEval).crossJoin(broadcast(evalV))
      .withColumn("sim",
        dotD(col("q_emb"), col("embedding")) /
          (sqrt(col("q_n2")) * sqrt(col("n2"))))
    graft.plans.TopK.perKeyWithRank(joined,
        Seq("vec_id"), Seq(("sim", true), ("eval_id", false)), 1, "rnk")
      .select(col("vec_id"), col("eval_id"), col("sim").as("max_sim"),
        (col("sim") >= lit(tau)).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  def annLsh(spark: SparkSession, dir: String, k: Int = 5, bitsIn: Int = -1): DataFrame = {
    val bits =
      if (bitsIn > 0) bitsIn
      else lshBitsFor(Tables.parquetRowCount(spark, s"$dir/embeddings.parquet"))
    val emb = withNorm(Tables.embeddings(spark, dir))
      .withColumn("bucket", lshKey(col("embedding"), bits))
    val a = emb.select(col("bucket"), col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val b = emb.select(col("bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("n2").as("n_n2"))
    a.join(b, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("sim",
        dotD(col("q_emb"), col("n_emb")) / (sqrt(col("q_n2")) * sqrt(col("n_n2"))))
      .transform(j => graft.plans.TopK.perKeyWithRank(j,
        Seq("q_id"), Seq(("sim", true), ("neighbor_id", false)), k, "rnk"))
      .select(col("q_id"), col("rnk"), col("neighbor_id"), col("sim"), col("bucket"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /**
   * Hard-negative mining for contrastive training: per probe vector,
   * the top-k most-similar corpus vectors whose LABEL differs from the
   * probe's — the near-misses a contrastive or reranker objective
   * learns the most from (cf. DPR, Karpukhin et al. 2020). Same probe
   * set, tiebreaks and bit-exact double cosine as the q34 brute-force
   * baseline (proven hash-exact against DuckDB), with the label
   * inequality applied BEFORE the bounded-heap top-k, so the heaps
   * only ever hold eligible candidates.
   *
   * Scale shape: identical to [[cosineTopK]] — one corpus scan against
   * a constant-size broadcast probe set, survivors bounded by
   * k·probes·partitions. At deployment scale the shortlist would come
   * from the stored IVF/PQ index instead of the scan; this is the
   * oracle-checkable exact twin.
   */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir))
    val queries = emb
      .filter(pmod(col("vec_id"), lit(20)) === 0 &&
        col("vec_id") < lit(20L * MaxBruteQueries))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("label").as("q_label"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("sim",
        dotD(col("q_emb"), col("embedding")) /
          (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .transform(j => graft.plans.TopK.perKeyWithRank(j,
        Seq("q_id"), Seq(("sim", true), ("vec_id", false)), k, "rnk"))
      .select(col("q_id"), col("q_label"), col("rnk"),
        col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
        col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /**
   * ANN MRR audit (q219): mean reciprocal rank of the multi-probe LSH
   * route against the exact baseline — the rank-POSITION companion to
   * the recall family (q149–q151/q159/q161): recall says whether true
   * neighbors appear anywhere in the top-k, MRR says how HIGH the
   * first one lands, which is what a retrieve-then-rerank budget
   * actually depends on (a hit at rank 1 needs no rerank depth; a hit
   * at rank k needs all of it).
   *
   * Reciprocal ranks are fixed-point MICRO-units — `10⁶ div rank` per
   * hit query, 0 for misses, mean = one integer division — because a
   * float 1/rank sum is order-sensitive and can't hash-match
   * cross-engine (q164 discipline). Single-row output:
   * (n_queries, n_hit, n_hit_at_1, mrr_micro).
   *
   * Plan: both rankings are the existing bounded-query pipelines; the
   * hit test is a k·queries-row semi-join, the first-hit rank one tiny
   * aggregate. Nothing here grows with the corpus beyond the two
   * ranking passes themselves.
   */
  def annMrr(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 3): DataFrame = {
    val exact = cosineTopKOf(Tables.embeddings(spark, dir), k)
      .select(col("q_id"), col("neighbor_id"))
    val ann = annLshMultiProbe(spark, dir, k, probes)
      .filter(pmod(col("q_id"), lit(20)) === 0 &&
        col("q_id") < lit(20L * MaxBruteQueries))
      .select(col("q_id"), col("neighbor_id"), col("rnk"))
    val firstHit = ann
      .join(exact, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(min(col("rnk")).as("first_hit_rank"))
    exact.select(col("q_id")).distinct()
      .join(firstHit, Seq("q_id"), "left")
      .agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("first_hit_rank").isNotNull, 1L).otherwise(0L))
          .as("n_hit"),
        sum(when(col("first_hit_rank") === 1L, 1L).otherwise(0L))
          .as("n_hit_at_1"),
        sum(coalesce(expr("1000000 div first_hit_rank"), lit(0L)))
          .as("rr_micro_sum"))
      .withColumn("mrr_micro", expr("rr_micro_sum div n_queries"))
      .select(col("n_queries"), col("n_hit"), col("n_hit_at_1"),
        col("mrr_micro"))
  }

  /** Fixed-point micro discount weights for NDCG positions 1..k:
    * floor(10⁶ / log₂(i+1)). Computed ONCE here and interpolated as
    * integer literals into both the Column expression and the DuckDB
    * oracle SQL, so no cross-engine floating-point log ever runs —
    * the whole NDCG stays in exact integer arithmetic. */
  private[graft] def ndcgWeightsMicro(k: Int): IndexedSeq[Long] =
    (1 to k).map(i => (1000000.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /**
   * ANN ranking-quality audit #3 — NDCG@k of the multi-probe route
   * against the exact cosine ranking: recall (q150) counts set overlap
   * and MRR (q219) only sees the first hit; NDCG grades the WHOLE
   * returned ordering, crediting the index for surfacing the most
   * similar neighbors early (gain of an exact-rank-r neighbor is
   * k+1−r, discounted by the standard 1/log₂(pos+1) — in micro
   * fixed-point, [[ndcgWeightsMicro]]). Per query:
   * ndcg = DCG/IDCG in ppm; output is the bounded summary (count,
   * perfect-ordering count, mean).
   *
   * Scale shape: identical to q219 — both rankings come from the
   * bounded-heap top-k over the bounded query set, the join is
   * (queries·k)-sized, and the summary is one group-less aggregate.
   */
  def annNdcg(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 3): DataFrame = {
    val w = ndcgWeightsMicro(k)
    def wOf(rnk: Column): Column =
      (1 to k).foldLeft(lit(0L))((acc, i) =>
        when(rnk === i, lit(w(i - 1))).otherwise(acc))
    val exact = cosineTopKOf(Tables.embeddings(spark, dir), k)
      .select(col("q_id"), col("neighbor_id"),
        (lit(k + 1L) - col("rnk")).as("gain"), col("rnk").as("ex_rnk"))
    val ann = annLshMultiProbe(spark, dir, k, probes)
      .filter(pmod(col("q_id"), lit(20)) === 0 &&
        col("q_id") < lit(20L * MaxBruteQueries))
      .select(col("q_id"), col("neighbor_id"), col("rnk"))
    val dcg = ann
      .join(exact.select(col("q_id"), col("neighbor_id"), col("gain")),
        Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id"))
      .agg(sum(col("gain") * wOf(col("rnk"))).as("dcg_micro"))
    val idcg = exact.groupBy(col("q_id"))
      .agg(sum(col("gain") * wOf(col("ex_rnk"))).as("idcg_micro"))
    idcg.join(dcg, Seq("q_id"), "left")
      .withColumn("ndcg_micro",
        expr("(1000000 * coalesce(dcg_micro, 0)) div idcg_micro"))
      .agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("ndcg_micro") === 1000000L, 1L).otherwise(0L))
          .as("n_perfect"),
        sum(col("ndcg_micro")).as("ndcg_micro_sum"))
      .withColumn("mean_ndcg_micro", expr("ndcg_micro_sum div n_queries"))
      .select(col("n_queries"), col("n_perfect"), col("mean_ndcg_micro"))
  }
}
