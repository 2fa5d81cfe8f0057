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
 * band tables, simhash signatures, the bigram LM — see `ModelCache`);
 * in a live corpus those artifacts must track document arrivals
 * without a full rebuild.
 *
 * Design — APPEND PARTIALS, COMPACT BEHIND A MANIFEST
 * ([[ManifestArtifact]]):
 *  - each micro-batch writes its partial transform to its own
 *    `part-b<batchId>` directory, then COMMITS it by atomically
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
 *  - [[ManifestArtifact.compact]] folds the listed partials into one
 *    `baseline-g<covered>` directory and commits a one-line manifest.
 *    The fold is written BEFORE the commit and partials are deleted
 *    AFTER it, so a crash anywhere leaves either the old manifest
 *    (all partials intact) or the new one (baseline intact) — never a
 *    half-applied state. Orphan directories a crash strands are swept
 *    on the next compaction (they are unreadable either way: readers
 *    never touch unlisted directories).
 *
 * Two artifact shapes, one mechanism:
 *  - MERGEABLE AGGREGATES (the bigram LM): partials are per-batch
 *    count tables; serve re-aggregates the union (sum is associative).
 *  - ROW-PARTITIONED tables (simhash signatures): each doc's row is
 *    computed row-locally, so partials just concatenate; serve is the
 *    bare union.
 *
 * Single-writer contract (documented, not enforced): one stream
 * maintains one artifact dir, and compaction runs on the same driver
 * (e.g. between restarts or from a maintenance trigger) — the same
 * contract every checkpoint-based Structured Streaming sink has.
 */
object ArtifactMaintenance {

  private[streaming] case class Manifest(covered: Long, dirs: Seq[String])

  /**
   * One manifest-committed artifact directory.
   *
   * @param artifactDir root directory (manifest + partial/baseline dirs)
   * @param partialOf   per-batch transform: (doc_id, text) micro-batch
   *                    → this batch's partial rows
   * @param emptySchema served schema before any batch commits
   * @param reduceOf    fold applied over the UNION of partials at serve
   *                    time — identity for row-partitioned artifacts,
   *                    a re-aggregation for mergeable-count artifacts
   */
  final class ManifestArtifact(
      val artifactDir: String,
      partialOf: DataFrame => DataFrame,
      emptySchema: StructType,
      reduceOf: DataFrame => DataFrame = identity) {

    private def manifestPath: Path = Paths.get(artifactDir, "manifest")

    private[streaming] def readManifest(): Manifest = {
      val p = manifestPath
      if (!Files.exists(p)) Manifest(-1L, Nil)
      else {
        val lines = Files.readAllLines(p).asScala.toSeq
        val covered = lines.headOption
          .flatMap(l => l.stripPrefix("covered=").toLongOption).getOrElse(-1L)
        Manifest(covered, lines.drop(1).filter(_.nonEmpty))
      }
    }

    private def commitManifest(m: Manifest): Unit = {
      val tmp = Paths.get(artifactDir, "manifest.tmp")
      Files.createDirectories(Paths.get(artifactDir))
      Files.write(tmp, (s"covered=${m.covered}" +: m.dirs).asJava)
      Files.move(tmp, manifestPath,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }

    /** One micro-batch application — the foreachBatch body, directly
      * callable so specs can replay arbitrary (batch, id) sequences. */
    def applyBatch(batch: DataFrame, batchId: Long): Unit = {
      val m = readManifest()
      val dir = s"part-b$batchId"
      // replay after compaction (id already folded) or after a
      // completed commit: nothing to do — this is the idempotence
      if (batchId > m.covered && !m.dirs.contains(dir)) {
        partialOf(batch)
          .write.mode("overwrite").parquet(s"$artifactDir/$dir")
        commitManifest(m.copy(dirs = m.dirs :+ dir))
      }
    }

    /** Wire a streaming document feed (doc_id, text) to maintain this
      * artifact. Caller starts/stops the returned writer and owns the
      * checkpoint location, as all MicroBatch jobs here do. */
    def maintain(docs: DataFrame): DataStreamWriter[Row] =
      docs.writeStream
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(0L))
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          applyBatch(batch, batchId)
        }

    /** The serve view over the manifest-listed directories — what
      * `ModelCache` would pin for the batch engine. */
    def serve(spark: SparkSession): DataFrame = {
      val m = readManifest()
      if (m.dirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], emptySchema)
      else
        reduceOf(spark.read.parquet(m.dirs.map(d => s"$artifactDir/$d"): _*))
    }

    /** Compact the listed partials into a single baseline directory
      * and commit it. See class doc for the crash story; also sweeps
      * orphan directories no manifest references (strandings from
      * earlier crashes), EXCEPT `part-b<id>` dirs above the covered
      * watermark — those may be an in-flight uncommitted batch. */
    def compact(spark: SparkSession): Unit = {
      val m = readManifest()
      if (m.dirs.size > 1) {
        val covered = (m.covered +: m.dirs.flatMap(d =>
          "part-b(\\d+)".r.findFirstMatchIn(d).map(_.group(1).toLong))).max
        val baseline = s"baseline-g$covered"
        serve(spark)
          .write.mode("overwrite").parquet(s"$artifactDir/$baseline")
        commitManifest(Manifest(covered, Seq(baseline)))
      }
      sweepOrphans()
    }

    private def sweepOrphans(): Unit = {
      val live = readManifest()
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

  // ---- the bigram LM (mergeable counts) ---------------------------

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

  def lmArtifact(artifactDir: String): ManifestArtifact =
    new ManifestArtifact(artifactDir, batchBigramCounts, CountsSchema,
      reduceOf = _.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("n")))

  def maintainLm(docs: DataFrame, artifactDir: String): DataStreamWriter[Row] =
    lmArtifact(artifactDir).maintain(docs)

  def lmCounts(spark: SparkSession, artifactDir: String): DataFrame =
    lmArtifact(artifactDir).serve(spark)

  def compactLm(spark: SparkSession, artifactDir: String): Unit =
    lmArtifact(artifactDir).compact(spark)

  // ---- source unigram counts (mergeable) --------------------------

  private val SrcUnigramSchema = StructType(Seq(
    StructField("source", StringType), StructField("w", StringType),
    StructField("n_sw", LongType)))

  /** Per-batch (source, word) partial counts — delegates to the ONE
    * shared projection (Curation.sourceUnigramCounts), so streamed
    * partials are structurally bit-compatible with the memoized
    * `source-unigrams` batch artifact. */
  private[streaming] def batchSourceUnigrams(batch: DataFrame): DataFrame =
    graft.llm.Curation.sourceUnigramCounts(batch)

  /** The (source, word) count store maintained from a document stream —
    * the live twin of the memoized `source-unigrams` artifact behind
    * the TV-drift query (q182): counts merge by summation, so serve
    * re-aggregates the committed partials. */
  def sourceUnigramArtifact(artifactDir: String): ManifestArtifact =
    new ManifestArtifact(artifactDir, batchSourceUnigrams, SrcUnigramSchema,
      reduceOf = _.groupBy(col("source"), col("w"))
        .agg(sum(col("n_sw")).as("n_sw")))

  // ---- boilerplate prefix counts (mergeable) ----------------------

  private val PrefixSchema = StructType(Seq(
    StructField("source", StringType), StructField("prefix", StringType),
    StructField("n_docs", LongType)))

  /** The (source, prefix) count store maintained from a document
    * stream — the live twin of the pinned aggregate behind the
    * boilerplate audit (q193). Counts merge by summation; the flagged
    * sliver (`n_docs >= minDocs`) is re-derived from the served table,
    * so a prefix crossing the threshold as documents arrive surfaces
    * on the next serve without any rebuild. Delegates to the ONE
    * shared projection (Curation.prefixCounts). */
  def prefixArtifact(artifactDir: String): ManifestArtifact =
    new ManifestArtifact(artifactDir,
      batch => graft.llm.Curation.prefixCounts(batch), PrefixSchema,
      reduceOf = _.groupBy(col("source"), col("prefix"))
        .agg(sum(col("n_docs")).as("n_docs")))

  // ---- simhash signatures (row-partitioned) -----------------------

  private val SigSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("simhash", LongType)))

  /** The (doc_id, simhash) signature store maintained from a stream —
    * the live twin of the memoized `simhash-sigs` artifact (q33/q62):
    * signing is row-local per doc, so partials concatenate and serve
    * is the bare union. Banding/pairing (`Dedup.simhashPairsFrom`)
    * runs over the served table exactly as over the batch artifact. */
  def simhashArtifact(artifactDir: String): ManifestArtifact =
    new ManifestArtifact(artifactDir,
      batch => graft.llm.Dedup.simhashAgg(batch), SigSchema)

  // ---- dup-gram doc-id bounds (mergeable min/max) -----------------

  private val GramBoundsSchema = StructType(Seq(
    StructField("g", StringType), StructField("lo", LongType),
    StructField("hi", LongType)))

  /** The per-gram document-id bounds store maintained from a document
    * stream — the live twin of the `dup-gram-keepers` batch artifact
    * behind the exact-substring trim (q213). A third merge shape on
    * the same manifest mechanism: bounds merge by (MIN lo, MAX hi) —
    * min/max are as mergeable as sums, so per-batch partials commit
    * and serve re-reduces. The keeper selection (cross-doc grams only,
    * keep the lowest holder) is re-derived from the served table via
    * the SAME `TextAnalysis.keepersFromBounds`, so a gram becoming
    * cross-document as new batches arrive flips into the trim set on
    * the next serve with no rebuild. */
  def gramBoundsArtifact(artifactDir: String, k: Int = 7): ManifestArtifact =
    new ManifestArtifact(artifactDir,
      batch => graft.llm.TextAnalysis.spanGramBounds(batch, k),
      GramBoundsSchema,
      reduceOf = _.groupBy(col("g"))
        .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi")))

  // ---- per-source KMV sketches (mergeable min-k) ------------------

  private val KmvSchema = StructType(Seq(
    StructField("source", StringType), StructField("x", LongType)))

  /** The per-source KMV sketch store maintained from a document
    * stream — the live twin of the sketch behind the theta-overlap
    * estimates (q226). A FOURTH merge shape on the manifest
    * mechanism: distinct-then-min-k. Each batch commits its own
    * k-smallest gram digests (bounded: ≤ k rows per source per batch,
    * whatever the batch size); serve deduplicates the union (the same
    * gram arriving in two batches collapses) and re-takes the k
    * smallest — min-k(∪ partial min-k's) = min-k(∪ inputs), so the
    * served sketch equals the batch-built one over the same documents.
    * Estimates (`Dedup.kmvEstimates`) run over the served table
    * exactly as over the batch artifact. */
  def kmvArtifact(artifactDir: String, k: Int = 256): ManifestArtifact =
    new ManifestArtifact(artifactDir,
      batch => graft.llm.Dedup.kmvSketchOf(
        graft.llm.Dedup.sourceGramProjection(batch), k),
      KmvSchema,
      reduceOf = partials => graft.llm.Dedup.kmvReduce(partials, k))
}
