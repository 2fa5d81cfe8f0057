package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Streaming maintenance for STORED per-corpus artifacts: the batch
 * engine serves dedup/selection/novelty from pinned artifacts (LSH
 * band tables, the bigram LM — see `ModelCache`); in a live corpus
 * those artifacts must track document arrivals without a full rebuild.
 *
 * Design — APPEND PARTIALS, COMPACT BEHIND A MANIFEST:
 *  - each micro-batch writes its partial (w1, w2) → n aggregate to its
 *    own `part-b<batchId>` directory, then COMMITS it by atomically
 *    rewriting the `manifest` file (temp-write + atomic move). Readers
 *    load exactly the directories the manifest lists — an uncommitted
 *    or half-written directory is invisible. Maintenance cost scales
 *    with BATCH size, not corpus size; a full-artifact
 *    read-modify-write per batch would scale with the corpus.
 *  - replay idempotence: a batch replayed after a crash re-writes its
 *    own directory (overwrite) and re-commits the same manifest line;
 *    a batch replayed after its partial was already FOLDED into a
 *    baseline is skipped outright, because the manifest carries
 *    `covered=<max folded batch id>` and stream batch ids are
 *    monotonic — the two rules together make double-counting
 *    impossible at any crash point.
 *  - [[compactLm]] folds the listed partials into one
 *    `baseline-g<covered>` directory and commits a one-line manifest.
 *    The fold is written BEFORE the commit and partials are deleted
 *    AFTER it, so a crash anywhere leaves either the old manifest
 *    (all partials intact) or the new one (baseline intact) — never a
 *    half-applied state. Orphan directories a crash strands are
 *    swept on the next compaction (they are unreadable either way:
 *    readers never touch unlisted directories).
 *
 * Single-writer contract (documented, not enforced): one stream
 * maintains one artifact dir, and compaction runs on the same driver
 * (e.g. between restarts or from a maintenance trigger) — the same
 * contract every checkpoint-based Structured Streaming sink has.
 */
object ArtifactMaintenance {

  private val CountsSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("n", LongType)))

  /** Per-batch bigram partial counts — the SAME (w1, w2) projection
    * the stored batch LM aggregates (MixPlan.docBigrams), so streamed
    * partials are bit-compatible with the `bigram-lm` artifact. */
  private[streaming] def batchBigramCounts(batch: DataFrame): DataFrame =
    graft.llm.MixPlan.docBigrams(batch)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))

  // ---- manifest: the artifact's atomic commit point ----------------

  private[streaming] case class Manifest(covered: Long, dirs: Seq[String])

  private def manifestPath(root: String): Path = Paths.get(root, "manifest")

  private[streaming] def readManifest(root: String): Manifest = {
    val p = manifestPath(root)
    if (!Files.exists(p)) Manifest(-1L, Nil)
    else {
      val lines = Files.readAllLines(p).asScala.toSeq
      val covered = lines.headOption
        .flatMap(l => l.stripPrefix("covered=").toLongOption).getOrElse(-1L)
      Manifest(covered, lines.drop(1).filter(_.nonEmpty))
    }
  }

  private[streaming] def commitManifest(root: String, m: Manifest): Unit = {
    val tmp = Paths.get(root, "manifest.tmp")
    Files.write(tmp, (s"covered=${m.covered}" +: m.dirs).asJava)
    Files.move(tmp, manifestPath(root),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- maintenance ------------------------------------------------

  /** Wire a streaming document feed (doc_id, text) to maintain the LM
    * artifact at `artifactDir`. Caller starts/stops the returned
    * writer and owns the checkpoint location, as all MicroBatch jobs
    * here do. */
  def maintainLm(docs: DataFrame, artifactDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, artifactDir)
      }

  /** One micro-batch application — the foreachBatch body, directly
    * callable so specs can replay arbitrary (batch, id) sequences. */
  private[streaming] def applyBatch(
      batch: DataFrame, batchId: Long, artifactDir: String): Unit = {
    val m = readManifest(artifactDir)
    val dir = s"part-b$batchId"
    // replay after compaction (id already folded) or after a
    // completed commit: nothing to do — this is the idempotence
    if (batchId > m.covered && !m.dirs.contains(dir)) {
      batchBigramCounts(batch)
        .write.mode("overwrite").parquet(s"$artifactDir/$dir")
      commitManifest(artifactDir, m.copy(dirs = m.dirs :+ dir))
    }
  }

  /** The serve view: fold the manifest-listed partials into corpus
    * bigram counts — what `ModelCache` would pin as the `bigram-lm`
    * artifact. Empty-schema result before any batch commits. */
  def lmCounts(spark: SparkSession, artifactDir: String): DataFrame = {
    val m = readManifest(artifactDir)
    if (m.dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], CountsSchema)
    else
      spark.read.parquet(m.dirs.map(d => s"$artifactDir/$d"): _*)
        .groupBy(col("w1"), col("w2"))
        .agg(sum(col("n")).as("n"))
  }

  /**
   * Compact the listed partials into a single baseline directory and
   * commit it as the new manifest. See class doc for the crash story;
   * also sweeps orphan directories no manifest references (strandings
   * from earlier crashes — unreadable, safe to delete, EXCEPT
   * `part-b<id>` dirs with id above the covered watermark, which may
   * be an in-flight uncommitted batch write).
   */
  def compactLm(spark: SparkSession, artifactDir: String): Unit = {
    val m = readManifest(artifactDir)
    if (m.dirs.size > 1) {
      val covered = (m.covered +: m.dirs.flatMap(d =>
        "part-b(\\d+)".r.findFirstMatchIn(d).map(_.group(1).toLong))).max
      val baseline = s"baseline-g$covered"
      lmCounts(spark, artifactDir)
        .write.mode("overwrite").parquet(s"$artifactDir/$baseline")
      commitManifest(artifactDir, Manifest(covered, Seq(baseline)))
    }
    sweepOrphans(artifactDir)
  }

  private def sweepOrphans(artifactDir: String): Unit = {
    val live = readManifest(artifactDir)
    val listing = Files.list(Paths.get(artifactDir))
    val entries = try listing.iterator().asScala.toList finally listing.close()
    entries
      .filter(p => Files.isDirectory(p))
      .filter { p =>
        val name = p.getFileName.toString
        !live.dirs.contains(name) && (name match {
          case s if s.startsWith("baseline-") => true
          case s => "part-b(\\d+)".r.findFirstMatchIn(s)
            .exists(_.group(1).toLong <= live.covered)
        })
      }
      .foreach { p =>
        val walk = Files.walk(p)
        val files = try walk.iterator().asScala.toList finally walk.close()
        files.reverse.foreach(Files.delete)
      }
  }
}
