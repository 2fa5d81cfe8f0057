package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-LAYOUT operators: multi-dimensional clustering keys that decide
 * how 100 TB lands on disk. A table range-partitioned and sorted by a
 * Z-order (Morton) key over its two hottest filter columns serves
 * 2-D range predicates from a small fraction of its files — per-file
 * min/max stats stay tight on BOTH dimensions simultaneously, which a
 * lexicographic (a, b) sort only achieves for the leading column.
 * This is the layout trick behind Delta/Iceberg `ZORDER BY`; here it
 * is a plain Catalyst arithmetic expression, so the write path is
 * `df.repartitionByRange(zorderKey(...)).sortWithinPartitions(...)` —
 * no custom writer, and the key itself is deterministic integer math
 * (bit-exact in any engine, so the DuckDB oracle replays it).
 */
object Layout {

  /** Bits interleaved per dimension. 16+16 → a 32-bit Z-value. */
  val ZBits = 16

  /**
   * Morton interleave of the low [[ZBits]] bits of two non-negative
   * integral columns: bit i of `x` lands at Z-bit 2i, bit i of `y` at
   * 2i+1. Pure codegen'd arithmetic — 32 shift/mask/add terms, no UDF,
   * no join, no state — so it costs what a projection costs and the
   * optimizer can constant-fold / push it like any expression.
   */
  def zorderKey(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /**
   * Z-order layout AUDIT over lineitem's (l_partkey, l_suppkey) — the
   * two independent filter dimensions a parts-supply workload hits.
   * Rows are assigned their Z-value and grouped into the 4096 buckets
   * given by the top 12 Z-bits (what a range-partitioner would make
   * file boundaries); per bucket the audit reports row count and the
   * min/max of each dimension — the exact per-file stats a scan
   * planner would prune on. The Z-property under test: a bucket fixes
   * the high 6 bits of BOTH keys, so every bucket's span is ≤ 2^10 in
   * each dimension no matter how many rows it holds (a lexicographic
   * sort bounds only l_partkey's span; l_suppkey's stays full-range).
   *
   * Scale shape: one scan, row-local arithmetic, one aggregate keyed
   * on the 12-bit bucket — at 100 TB this is the cheap audit you run
   * AFTER a relayout to certify pruning effectiveness, and the same
   * key feeds `repartitionByRange` to produce that layout in the
   * first place.
   */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.model.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    li.withColumn("z", zorderKey(col("l_partkey"), col("l_suppkey")))
      .withColumn("bucket", shiftright(col("z"), 20))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("part_lo"),
        max(col("l_partkey")).as("part_hi"),
        min(col("l_suppkey")).as("supp_lo"),
        max(col("l_suppkey")).as("supp_hi"))
      .orderBy(col("bucket"))
  }

  /** The same Morton interleave as SQL text, for the DuckDB oracle —
    * generated from the SAME loop so the two cannot drift. */
  def zorderSql(x: String, y: String): String = zorderSqlN(x, y, ZBits)

  /** [[zorderKey]] with a caller-chosen bit width (the zone-map audit
    * compares layouts over a 10-bit/dim grid). */
  def zorderKeyN(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** [[zorderSql]] with a caller-chosen bit width. */
  def zorderSqlN(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  // --------------------------------------------------------------------
  // Hilbert curve: the stronger layout key. Morton order teleports at
  // quadrant boundaries (cell 0b0111.. to 0b1000.. jumps across the
  // grid), so consecutive Z-buckets are not spatial neighbours; the
  // Hilbert curve visits every cell of the 2^b x 2^b grid in unit
  // steps, so aligned runs of 4^k consecutive curve positions tile
  // EXACT 2^k x 2^k subsquares AND consecutive buckets abut — tighter
  // per-file bounding boxes and sequential reads that stay spatially
  // local. This is the layout Delta/Iceberg expose as `hilbert_curve`
  // clustering; here it is the standard xy2d bit walk (Wikipedia's
  // iterative form) expressed as ONE aggregate fold over the level
  // array — a single linear-size expression of integer built-ins per
  // row, so the key costs what any derived column costs: no UDF, no
  // join, no shuffle, replayable bit-exactly by the DuckDB oracle.
  // --------------------------------------------------------------------

  /** Bits per dimension for the Hilbert key: a 20-bit curve position
    * over a 1024 x 1024 grid. */
  val HBits = 10

  /** Low-bit mask confining each dimension to the Hilbert grid. */
  val HMask: Long = (1L << HBits) - 1

  /** Dropping the low 8 curve bits yields 4096 buckets of 256 = 4^4
    * consecutive cells — each an exact 16 x 16 subsquare. */
  val HBucketShift = 8

  /** The per-level subsquare sizes the xy2d walk descends through,
    * shared by the Column and SQL generators so they cannot drift. */
  private def hilbertLevels(bits: Int): Seq[Long] =
    (bits - 1 to 0 by -1).map(1L << _)

  /**
   * Appends Hilbert curve position `out` computed from the low `bits`
   * bits of integral columns `x`/`y`, as ONE `aggregate` fold over the
   * level array whose state is (x, y, d): each step folds the quadrant
   * digit into the position and applies the reflect-swap rotation. The
   * quadrant digit (3*rx) XOR ry is carried as the XOR-free polynomial
   * ry + rx*(3 - 2*ry) (identical truth table), so every operation is
   * +,*,comparison — bit-exact in any engine.
   *
   * Deliberately a FOLD, not a per-level `withColumn` chain: chained
   * projections where level i+1 reads level i's outputs get INLINED by
   * CollapseProject, doubling the expression tree per level — the
   * 10-level chain measurably blew q244 to 5.1 s at sf0.1. The fold is
   * one linear-size expression evaluated iteratively per row (the q40
   * fingerprint shape); same math, same oracle.
   */
  def withHilbert(df: DataFrame, x: Column, y: Column, out: String,
      bits: Int = HBits): DataFrame = {
    val mask = lit((1L << bits) - 1)
    df.withColumn(out,
      aggregate(
        array(hilbertLevels(bits).map(lit): _*),
        struct(
          x.cast("long").bitwiseAND(mask).as("x"),
          y.cast("long").bitwiseAND(mask).as("y"),
          lit(0L).as("d")),
        (st, s) => {
          val (sx, sy, sd) =
            (st.getField("x"), st.getField("y"), st.getField("d"))
          val rx = when(sx.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
          val ry = when(sy.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
          struct(
            when(ry === 0,
              when(rx === 1, s - lit(1L) - sy).otherwise(sy))
              .otherwise(sx).as("x"),
            when(ry === 0,
              when(rx === 1, s - lit(1L) - sx).otherwise(sx))
              .otherwise(sy).as("y"),
            (sd + s * s * (ry + rx * (lit(3L) - lit(2L) * ry))).as("d"))
        },
        st => st.getField("d")))
  }

  /**
   * The same xy2d walk as chained SQL CTEs for the DuckDB oracle —
   * generated from the SAME [[hilbertLevels]] loop. `base` must expose
   * integer columns `x`, `y` (already masked to `bits`); the final CTE
   * is named `h0` and carries (x, y, hd). The only operators used are
   * &, +, *, CASE — no engine-divergent XOR/power spelling.
   */
  def hilbertSqlCtes(base: String, bits: Int = HBits): String = {
    val init = s"hinit AS (SELECT x, y, x AS hx, y AS hy, " +
      s"CAST(0 AS BIGINT) AS hd FROM $base)"
    // fresh names (nx/ny/nd) inside, renamed by an outer select —
    // never `... AS hx` beside an expression reading the old hx, so
    // lateral-column-alias resolution can't bind the wrong one
    val levels = hilbertLevels(bits).zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) "hinit" else s"h${bits - i}"
      s"""h${bits - 1 - i} AS (SELECT x, y, nx AS hx, ny AS hy, nd AS hd FROM (
         |  SELECT x, y,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END
         |         ELSE hx END AS nx,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END
         |         ELSE hy END AS ny,
         |    hd + ${s * s} * (ry + rx * (3 - 2 * ry)) AS nd
         |  FROM (SELECT *,
         |      CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry FROM $prev)))"""
        .stripMargin
    }
    (init +: levels).mkString(",\n")
  }

  /**
   * Hilbert layout AUDIT — the q176 shape on the stronger key: rows
   * land at their curve position over the masked 1024 x 1024
   * (l_partkey, l_suppkey) grid, buckets are the top 12 curve bits
   * (4096 would-be files), and the audit reports each bucket's row
   * count and per-dimension bounding box. The pin: every bucket is an
   * aligned 16 x 16 subsquare, so both spans are <= 15 — strictly the
   * bound a scan planner prunes on, and sharper than any interleave
   * argument (a single rotation bug scatters cells and breaks it).
   *
   * Scale shape: one scan, one collapsed projection, one 4096-group
   * hash aggregate. At 100 TB the same key feeds
   * `repartitionByRange(col("hd")).sortWithinPartitions("hd")` to
   * produce the layout this audit certifies.
   */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame = {
    // rows meet only the square group-by; the 6-bit walk runs on the
    // <= 4096-row square table (hd >> 8 = H6(x >> 4, y >> 4) — the
    // coarsening argument on [[zoneStats]], spec-pinned)
    val sq = squareStats(maskedKeys(spark, dir))
    withHilbert(sq, col("sx"), col("sy"), "bucket", HBits - HBucketShift / 2)
      .select(col("bucket"), col("n").as("n_rows"),
        col("zx_lo").as("x_lo"), col("zx_hi").as("x_hi"),
        col("zy_lo").as("y_lo"), col("zy_hi").as("y_hi"))
      .orderBy(col("bucket"))
  }

  /** The fixed 2-D range-predicate workload the zone-map audit prunes
    * against: (pred_id, x_lo, x_hi, y_lo, y_hi) boxes on the masked
    * grid — two boxes, a wide band, and a narrow column slice (the
    * slice is where lexicographic layout collapses to a full scan). */
  val ZonePreds: Seq[(Int, Long, Long, Long, Long)] = Seq(
    (1, 64L, 191L, 8L, 23L),
    (2, 0L, 511L, 0L, 63L),
    (3, 768L, 1023L, 32L, 47L),
    (4, 390L, 409L, 0L, 1023L))

  /**
   * Zone-map pruning effectiveness audit: the go/no-go number a
   * relayout decision needs BEFORE rewriting 100 TB. Three candidate
   * layouts — hilbert, zorder, lexicographic (x<<10 | y) — are
   * bucketed into 4096 would-be files each; per (layout, predicate)
   * the audit reports how many buckets a min/max zone map would scan
   * and how many rows those buckets hold, beside the true matching
   * row count (the irreducible floor). The curve layouts bound BOTH
   * dimensions per bucket, so 2-D boxes prune to a handful of files;
   * lex bounds only the leading key — predicate 4's x-slice shows the
   * inversion where lex wins and the boxes show where it loses.
   *
   * Scale shape: ONE corpus scan exploded 3x into a (layout, bucket)
   * hash aggregate of <= 3*4096 groups; the zone table and the
   * 4-predicate workload are then literal-sized — the pruning
   * arithmetic is a broadcast cross join over <= 12288 x 4 rows, and
   * the true-match floor is one more conditional aggregate of the
   * same scan. Nothing but the two scans grows with the data.
   */
  /**
   * Per-16x16-square statistics over masked (x, y) rows: the
   * corpus-scale phase of every layout audit. ONE hash aggregate onto
   * the <= 4096-key square grid — map-side combinable, so at 100 TB
   * each task emits at most 4096 partial rows no matter its input
   * size. Everything downstream (curve indexing, zone derivation)
   * runs on this bounded table, never on rows.
   */
  private def squareStats(base: DataFrame): DataFrame =
    base.groupBy(
        shiftright(col("x"), HBucketShift / 2).as("sx"),
        shiftright(col("y"), HBucketShift / 2).as("sy"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("zx_lo"), max(col("x")).as("zx_hi"),
        min(col("y")).as("zy_lo"), max(col("y")).as("zy_hi"))

  /**
   * The three-layout zone table over masked (x, y) rows: per
   * (layout, bucket) the row count and per-dimension bounding box —
   * the per-file statistics a scan planner prunes on.
   *
   * Buckets coarsen EXACTLY onto aligned subgrids, so the corpus
   * never meets a curve expression: a 20-bit curve bucket (low 8 bits
   * dropped) is an aligned 16x16 square for BOTH curves — for Morton
   * trivially (dropping 4 interleaved bit-pairs), for Hilbert because
   * the first 6 walk levels test only bits >= 16 and the reflection
   * s-1-x maps 16a+b to 16(S-1-a)+(15-b), never borrowing into the
   * high part — so hd >> 8 = H6(x >> 4, y >> 4) (spec-pinned against
   * the direct per-row walk). The audit therefore aggregates rows
   * onto the 4096-square grid first ([[squareStats]], map-side
   * combinable) and runs the 6-bit walk on <= 4096 rows; the lex
   * layout groups rows by its own (x, y >> 8) bucket key directly.
   * The first formulation keyed the full 10-bit walk per corpus row —
   * 5.5 s at sf0.1 against ~0.4 s for this shape, and at 100 TB the
   * difference is an interpreted per-row fold versus a combinable
   * integer group-by.
   *
   * Every output column is MERGEABLE (sum / min / max), so per-batch
   * partials fold to exactly the full-corpus table — the property the
   * streamed zone-map store (ArtifactMaintenance) rests on.
   */
  def zoneStats(base: DataFrame): DataFrame = {
    val sq = squareStats(base)
    val zoneCols = Seq(col("n"),
      col("zx_lo"), col("zx_hi"), col("zy_lo"), col("zy_hi"))
    val zh = withHilbert(sq, col("sx"), col("sy"), "bucket", HBits - HBucketShift / 2)
      .select(lit("hilbert").as("layout") +: col("bucket") +: zoneCols: _*)
    val zz = sq
      .select(lit("zorder").as("layout") +:
        zorderKeyN(col("sx"), col("sy"), HBits - HBucketShift / 2).as("bucket") +:
        zoneCols: _*)
    val zl = base.groupBy(col("x"), shiftright(col("y"), HBucketShift).as("yh"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("zx_lo"), max(col("x")).as("zx_hi"),
        min(col("y")).as("zy_lo"), max(col("y")).as("zy_hi"))
      .select(lit("lex").as("layout") +:
        (shiftleft(col("x"), HBits - HBucketShift) + col("yh")).as("bucket") +:
        zoneCols: _*)
    zh.unionByName(zz).unionByName(zl)
  }

  /** lineitem's (l_partkey, l_suppkey) masked onto the Hilbert grid —
    * the shared write-path projection of the layout audits. */
  def maskedKeys(spark: SparkSession, dir: String): DataFrame =
    graft.model.Tables.lineitem(spark, dir).select(
      col("l_partkey").bitwiseAND(lit(HMask)).as("x"),
      col("l_suppkey").bitwiseAND(lit(HMask)).as("y"))

  /** The zone-map pruning arithmetic over any (layout, bucket) zone
    * table — shared by [[zonemapPrune]] (batch-built zones) and the
    * streamed zone-map store's consumers: per (layout, pred) the
    * buckets a min/max zone map scans and the rows they hold.
    * Literal-sized broadcast cross join; `preds` must carry
    * (pred_id, px_lo, px_hi, py_lo, py_hi). */
  def pruneStats(zones: DataFrame, preds: DataFrame): DataFrame = {
    val hit = col("zx_lo") <= col("px_hi") && col("zx_hi") >= col("px_lo") &&
      col("zy_lo") <= col("py_hi") && col("zy_hi") >= col("py_lo")
    zones.crossJoin(broadcast(preds))
      .groupBy(col("layout"), col("pred_id"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(hit, lit(1L)).otherwise(lit(0L))).as("buckets_scanned"),
        sum(when(hit, col("n")).otherwise(lit(0L))).as("rows_scanned"))
  }

  def zonemapPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = maskedKeys(spark, dir)
    val zones = zoneStats(base)
    val preds = ZonePreds.toDF("pred_id", "px_lo", "px_hi", "py_lo", "py_hi")
    val scanned = pruneStats(zones, preds)
    val matching = base.crossJoin(broadcast(preds))
      .filter(col("x").between(col("px_lo"), col("px_hi")) &&
        col("y").between(col("py_lo"), col("py_hi")))
      .groupBy(col("pred_id")).agg(count(lit(1)).as("rows_matching"))
    scanned.join(broadcast(matching), Seq("pred_id"), "left")
      .select(col("layout"), col("pred_id"), col("n_buckets"),
        col("buckets_scanned"), col("rows_scanned"),
        coalesce(col("rows_matching"), lit(0L)).as("rows_matching"))
      .orderBy(col("layout"), col("pred_id"))
  }

  /** Planned output files for a sort-ordered compaction. */
  val CompactionFiles = 64

  /**
   * Sort-ordered compaction plan (q263) — the answer to the
   * small-files problem that does NOT throw away clustering: given the
   * hilbert bucket statistics ([[hilbertLayout]] — at 100 TB these are
   * the zone-map store's per-file stats, no data scan), assign each
   * bucket IN CURVE ORDER to one of [[CompactionFiles]] planned output
   * files by proportional prefix cut (`file = (rows_before · files)
   * div total` — the q139 budget-line idiom; a bucket never splits, so
   * rewrite tasks read whole input buckets). Because the cut follows
   * the curve, every planned file covers a CONTIGUOUS hilbert range —
   * zone-map pruning (q244) stays exactly as effective after the
   * rewrite as before, which is the property a naive size-only bin
   * packer (Iceberg's binPack without a sort order) destroys. Per
   * planned file: bucket count and range, rows, the 2-D bounding box
   * (the post-compaction zone map itself), and the fill share in ppm
   * (how even the packer landed).
   *
   * Scale shape: the only corpus-scale work is the bucket aggregate
   * behind [[hilbertLayout]]; both windows (running and total row
   * sums) run over the ≤ 4096-row PRE-AGGREGATED bucket table — the
   * q123 bounded-table window precedent, never a fact-scale window.
   */
  def compactionPlan(spark: SparkSession, dir: String,
      files: Int = CompactionFiles): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = hilbertLayout(spark, dir)
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cut = b
      .withColumn("cum", sum(col("n_rows")).over(w))
      .withColumn("tot", sum(col("n_rows")).over(Window.partitionBy()))
      .withColumn("file_id", expr(s"((cum - n_rows) * $files) div tot"))
    cut.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n_rows")).as("n_rows"),
        min(col("bucket")).as("bucket_lo"), max(col("bucket")).as("bucket_hi"),
        min(col("x_lo")).as("x_lo"), max(col("x_hi")).as("x_hi"),
        min(col("y_lo")).as("y_lo"), max(col("y_hi")).as("y_hi"),
        min(col("tot")).as("tot"))
      .withColumn("share_ppm", expr("(1000000 * n_rows) div tot"))
      .drop("tot")
      .orderBy("file_id")
  }

  /** [[ZonePreds]] as a DuckDB VALUES table expression. */
  def zonePredsSql: String =
    "(VALUES " + ZonePreds.map { case (id, xl, xh, yl, yh) =>
      s"($id, $xl, $xh, $yl, $yh)"
    }.mkString(", ") + ") AS t(pred_id, px_lo, px_hi, py_lo, py_hi)"

  // ---- written-layout certification (round-13 #1) --------------------
  //
  // q244 PREDICTS pruning from would-be zone maps; this section proves
  // the prediction against PHYSICAL files: write each candidate layout
  // as real multi-file parquet (repartitionByRange on the curve key +
  // sortWithinPartitions — exactly the write path the scaladoc above
  // prescribes), read back each file's min/max statistics, and compare
  // the zone-map arithmetic against what the parquet reader actually
  // materializes on a pushed 2-D range scan. Vanilla parquet scans have
  // no FILE-level stats skipping in Spark (that is the Iceberg/Delta
  // manifest layer); the measurable surface is ROW-GROUP pruning inside
  // the reader, and with one row group per file (true for any file
  // under the 128 MB block size) the two granularities coincide — so
  // `rows materialized == predicted rows_scanned` is an exact pin.

  /**
   * Write the three candidate layouts of lineitem's masked keys as real
   * multi-file parquet under `outBase` (`nFiles` range partitions
   * each), returning layout → path. The sort key is the layout's
   * clustering key; x/y land as ordinary data columns whose per-file
   * min/max footer stats are what a scan prunes on.
   */
  def writeLayouts(spark: SparkSession, dir: String, outBase: String,
      nFiles: Int): Map[String, String] =
    writeLayoutsOf(maskedKeys(spark, dir), outBase, nFiles)

  /** [[writeLayouts]] over an explicit masked (x, y) frame. */
  private[graft] def writeLayoutsOf(base: DataFrame, outBase: String,
      nFiles: Int): Map[String, String] = {
    val laid = Seq(
      "hilbert" -> withHilbert(base, col("x"), col("y"), "k"),
      "zorder" -> base.withColumn("k", zorderKeyN(col("x"), col("y"), HBits)),
      "lex" -> base.withColumn("k", shiftleft(col("x"), HBits) + col("y")))
    laid.map { case (name, df) =>
      val path = s"$outBase/$name"
      df.repartitionByRange(nFiles, col("k"))
        .sortWithinPartitions("k")
        .write.mode("overwrite").parquet(path)
      name -> path
    }.toMap
  }

  /** Per-FILE zone maps of a written layout, read back from the files
    * themselves — the exact statistics the parquet footers carry.
    * Shaped for [[pruneStats]] (bucket = file name). */
  def fileZones(spark: SparkSession, path: String,
      layoutName: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("zx_lo"), max(col("x")).as("zx_hi"),
        min(col("y")).as("zy_lo"), max(col("y")).as("zy_hi"))
      .withColumn("layout", lit(layoutName))

  /**
   * Execute a REAL 2-D box scan over a written layout and report
   * (rows the parquet reader materialized, rows matching the
   * predicate, files listed). Row-group statistics filtering stays ON
   * (the thing under test); page-level column-index filtering is
   * turned OFF so the measurement is row-group-granular — the same
   * granularity as the footer stats [[fileZones]] reads back.
   */
  def measuredScan(spark: SparkSession, path: String,
      pred: (Int, Long, Long, Long, Long)): (Long, Long, Long) = {
    val (_, xl, xh, yl, yh) = pred
    val df = spark.read
      .option("parquet.filter.columnindex.enabled", "false")
      .parquet(path)
      .filter(col("x").between(xl, xh) && col("y").between(yl, yh))
    val matching = df.collect().length.toLong // executes THIS plan
    val scans = collectFileScans(df.queryExecution.executedPlan)
    require(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
    (scans.map(_.metrics("numOutputRows").value).sum, matching,
      scans.map(_.metrics("numFiles").value).sum)
  }

  /** One (layout, pred) row of the written-layout certification:
    * the zone-map PREDICTION from the files' own footer stats beside
    * what the parquet reader actually MATERIALIZED. */
  final case class LayoutMeasurement(layout: String, predId: Int,
      rowsRead: Long, predictedRows: Long, bucketsHit: Long,
      matching: Long, total: Long, filesListed: Long)

  /**
   * The measurement loop itself — shared by `LayoutEndToEndSpec`
   * (which pins rowsRead == predictedRows per combination) and
   * `graft.LayoutMeasure` (which prints the SCALE.md numbers), so the
   * CI pin and the published table cannot measure different things.
   */
  def measureLayouts(spark: SparkSession, paths: Map[String, String],
      preds: Seq[(Int, Long, Long, Long, Long)]): Seq[LayoutMeasurement] = {
    import spark.implicits._
    val predsDf = preds.toDF("pred_id", "px_lo", "px_hi", "py_lo", "py_hi")
    paths.toSeq.sortBy(_._1).flatMap { case (name, path) =>
      val zones = fileZones(spark, path, name)
      val predicted = pruneStats(zones, predsDf).collect()
        .map(r => r.getAs[Int]("pred_id") ->
          (r.getAs[Long]("buckets_scanned"), r.getAs[Long]("rows_scanned")))
        .toMap
      val total = spark.read.parquet(path).count()
      preds.map { case pred @ (id, _, _, _, _) =>
        val (rowsRead, matching, filesListed) = measuredScan(spark, path, pred)
        val (bucketsPred, rowsPred) = predicted(id)
        LayoutMeasurement(name, id, rowsRead, rowsPred, bucketsPred,
          matching, total, filesListed)
      }
    }
  }

  /** File scans of an executed plan, descending through AQE wrappers. */
  private def collectFileScans(
      p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectFileScans(a.executedPlan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(collectFileScans)
  }
}
