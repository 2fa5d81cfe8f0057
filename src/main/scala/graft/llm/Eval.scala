package graft.llm

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Classifier-evaluation harness (q217): exact ranking metrics for the
 * heuristic scores the curation stack produces — does a cheap signal
 * actually separate the classes it claims to?
 */
object Eval {

  /**
   * Exact AUC (Mann–Whitney U) of a per-document score as a binary
   * classifier, demonstrated on the stopword-rate score predicting
   * `lang = 'en'` (the q37/q200 stopword lexicon IS an English
   * detector; this measures how good). AUC handles ties by the
   * standard half-credit convention:
   * AUC = (#concordant + #tied/2) / (n_pos·n_neg), computed ENTIRELY
   * in integers — `auc_ppm = (10⁶·(2·conc + tied)) div (2·n_pos·n_neg)`
   * — because a per-pair float average cannot hash-match cross-engine,
   * one integer division can (the q164/q168 fixed-point discipline).
   *
   * Scale shape: never the O(N²) pair enumeration. Scores collapse to
   * a DISTINCT-SCORE table (one hash aggregate; integer-ppm scores
   * bound it at ≤ 10⁶ rows regardless of corpus size) carrying
   * (n_pos, n_neg) per score; concordant pairs are
   * Σ_s n_pos(s) · [negatives strictly below s], with the running
   * negative count from [[graft.ops.GlobalOrder.withRankAndPrefix]] —
   * the two-phase distributed prefix sum, no single-task window. One
   * group-less aggregate folds the per-score products into the final
   * single-row report: (n_pos, n_neg, n_concordant, n_tied, auc_ppm).
   */
  def qualityAuc(spark: SparkSession, dir: String): DataFrame =
    qualityAucOf(Tables.documents(spark, dir))

  private[llm] def qualityAucOf(docs: DataFrame): DataFrame = {
    val scored = docs.select(
        split(col("text"), " ").as("ws"),
        (col("lang") === "en").as("pos"))
      .select(col("pos"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(expr("filter(ws, w -> w = 'the' OR w = 'a')"))
          .cast("long").as("n_stop"))
      .filter(col("n_tokens") > 0)
      .withColumn("score", expr("(1000000 * n_stop) div n_tokens"))
    val perScore = scored.groupBy(col("score"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    val ranked = graft.ops.GlobalOrder.withRankAndPrefix(
      perScore, Seq(col("score")), value = Some(col("nn")))
    ranked.agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        // g_prefix is the EXCLUSIVE running nn: negatives strictly
        // below this score — exactly the concordant count per positive
        sum(col("np") * col("g_prefix")).as("n_concordant"),
        sum(col("np") * col("nn")).as("n_tied"))
      .withColumn("auc_ppm",
        when(col("n_pos") * col("n_neg") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(1000000 * (2 * n_concordant + n_tied)) div (2 * n_pos * n_neg)")))
      .select(col("n_pos"), col("n_neg"), col("n_concordant"),
        col("n_tied"), col("auc_ppm"))
  }
}
