package graft.llm

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge learning (Sennrich et al. 2016) — the first
 * `M` merges of the tokenizer-training loop, learned over the corpus
 * word-frequency table (q214).
 *
 * One deliberate restriction: SELF-PAIRS (x, x) are excluded from the
 * merge candidates. With distinct halves a merge can never overlap
 * itself, so greedy left-to-right application — inherently sequential
 * per symbol run in full BPE ("aaa" merges positions 1-2, not 2-3) —
 * degenerates to "replace EVERY occurrence", a pure per-position map:
 * position i survives unless its left neighbor started a merge, and its
 * value widens when it starts one. That order-freeness is what makes
 * the apply step embarrassingly parallel across a 100 TB corpus (and
 * bit-replayable by the DuckDB oracle, which has no list-fold to
 * express run-parity semantics with).
 *
 * Scale shape: learning runs over the DISTINCT-WORD table (Heaps-law
 * sublinear in corpus size), weighted by exact Long word counts — the
 * corpus is scanned ONCE for the frequency table, then every iteration
 * is one vocab-scale pair aggregate + a 1-row argmax (deterministic
 * tiebreak: count desc, then pair lexicographic) read driver-side — a
 * bounded model read, the k-means/PageRank exemption — and a row-local
 * rewrite. `M` is a small constant; the driver loop is unrolled
 * identically by the oracle's chained CTEs.
 */
object Bpe {

  final case class Merge(rank: Int, pa: String, pb: String, n: Long)

  /** Learned first-`m` merges with post-merge corpus size: one row per
    * merge — (merge_rank, pair_a, pair_b, merged, pair_count,
    * n_symbols_after), where n_symbols_after is the exact
    * count-weighted total symbol count once that merge is applied. */
  def bpeMerges(spark: SparkSession, dir: String, m: Int = 3): DataFrame =
    bpeMergesOf(Tables.documents(spark, dir), m)

  private[llm] def bpeMergesOf(docs: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"need at least one merge, got $m")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    var syms = words.select(col("wc"), split(col("word"), "").as("s"))
    val out = Seq.newBuilder[(Int, String, String, Long, Long)]
    for (rank <- 1 to m) {
      // vocab-scale pair aggregate; self-pairs excluded (see scaladoc).
      // Single-symbol words are filtered BEFORE the explode: Spark's
      // sequence(1, 0) DESCENDS rather than being empty, so an
      // unguarded size-1 array would probe element_at(s, 2)
      val best = syms
        .filter(size(col("s")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(element_at(s, i) AS pa, element_at(s, i + 1) AS pb))")).as("p"))
        .filter(col("p.pa") =!= col("p.pb"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(1)
        .as[(String, String, Long)]
        .collect() // 1-row model read — the bounded-argmax exemption
      if (best.nonEmpty) {
        val (paRaw, pbRaw, n) = best.head
        // symbols come from corpus text; escape for the SQL literal
        val (pa, pb) = (paRaw.replace("'", "''"), pbRaw.replace("'", "''"))
        // order-free apply: drop the b of every (pa, pb) adjacency,
        // widen the a — a pure per-position projection
        syms = syms.select(col("wc"), expr(
          s"""transform(
             |  filter(sequence(1, size(s)), i ->
             |    NOT (i > 1 AND element_at(s, i - 1) = '$pa'
             |         AND element_at(s, i) = '$pb')),
             |  i -> IF(element_at(s, i) = '$pa' AND i < size(s)
             |          AND element_at(s, i + 1) = '$pb',
             |          concat('$pa', '$pb'), element_at(s, i)))""".stripMargin)
          .as("s"))
        val nSymbols = syms
          .agg(sum(col("wc") * size(col("s"))).as("t"))
          .as[Long].collect().head
        out += ((rank, paRaw, pbRaw, n, nSymbols))
      }
    }
    out.result()
      .toDF("merge_rank", "pair_a", "pair_b", "pair_count", "n_symbols_after")
      .withColumn("merge_rank", col("merge_rank").cast("long"))
      .select(col("merge_rank"), col("pair_a"), col("pair_b"),
        concat(col("pair_a"), col("pair_b")).as("merged"),
        col("pair_count"), col("n_symbols_after"))
      .orderBy(col("merge_rank"))
  }
}
