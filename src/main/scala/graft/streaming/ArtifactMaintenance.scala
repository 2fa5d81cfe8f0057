package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/**
 * Streaming maintenance for STORED per-corpus artifacts: the batch
 * engine serves dedup/selection/novelty from pinned artifacts (LSH
 * band tables, the bigram LM — see `ModelCache`); in a live corpus
 * those artifacts must track document arrivals without a full rebuild.
 *
 * Design — APPEND PARTIALS, COMPACT ON READ (never read-modify-write):
 * each micro-batch writes its own partial aggregate under a
 * `batch_id=<id>` partition directory; the serve view unions the
 * partials and re-aggregates. At 100 TB the alternative (rewriting the
 * whole artifact every batch) scales with CORPUS size per batch; this
 * path scales with BATCH size per batch, and reads prune by partition.
 * The per-batch write is an overwrite of ITS OWN partition, so a
 * replayed batch (crash between write and checkpoint commit)
 * overwrites the same bytes instead of double-counting — idempotence
 * comes from the layout, not from a transaction log.
 *
 * Periodic [[compactLm]] folds the accumulated partials into a single
 * `batch_id=-1` baseline partition (counts are sums — associative —
 * so baseline + newer partials is exact), bounding the partial-file
 * count the serve view unions.
 */
object ArtifactMaintenance {

  /** Per-batch bigram partial counts of a micro-batch of documents
    * (`doc_id`, `text`): the same (w1, w2) → n aggregate the stored
    * q168 LM uses, computed over the batch only. */
  private[streaming] def batchBigramCounts(batch: DataFrame): DataFrame =
    batch
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n"))

  /** Wire a streaming document feed to maintain the LM artifact at
    * `artifactDir`. Caller starts/stops the returned writer (and owns
    * the checkpoint location, as all MicroBatch jobs here do). */
  def maintainLm(docs: DataFrame, artifactDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchBigramCounts(batch)
          .write.mode("overwrite")
          .parquet(s"$artifactDir/batch_id=$batchId")
      }

  /** The serve view: fold all partials into corpus bigram counts —
    * what `ModelCache` would pin as the `bigram-lm` artifact. */
  def lmCounts(spark: SparkSession, artifactDir: String): DataFrame =
    spark.read.parquet(artifactDir)
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("n")).as("n"))

  /**
   * Compact accumulated partials into a single baseline partition.
   * Two-phase for crash safety: write the folded counts to a temp
   * sibling, then swap it in as `batch_id=-1` and drop the folded
   * partials. A crash mid-swap leaves either the old partials or the
   * new baseline readable — counts are never half-applied because the
   * fold is written before any partial is removed.
   */
  def compactLm(spark: SparkSession, artifactDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(artifactDir)
    val partials = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("batch_id="))
      .toList
    if (partials.size <= 1) return
    val tmp = root.resolve("_compact_tmp")
    lmCounts(spark, artifactDir)
      .write.mode("overwrite").parquet(tmp.toString)
    partials.foreach { p =>
      Files.walk(p).iterator().asScala.toList.reverse.foreach(Files.delete)
    }
    Files.move(tmp, root.resolve("batch_id=-1"))
  }
}
