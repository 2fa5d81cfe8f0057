package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multi-format sink/source round-trip (q255): a complete engine reads
 * more than parquet. Each supported interchange format — CSV, JSON,
 * ORC, and parquet as the control — gets the same lineitem key slice
 * WRITTEN through its real `FileFormat` sink and READ back through its
 * real source with an EXPLICIT schema (schema-on-read discipline: CSV
 * and JSON carry no types, so inference is banned — an inferred
 * BIGINT-vs-INT flip is exactly the production bug this pins against),
 * then reduced to exact-integer checksums. The DuckDB oracle computes
 * the same checksums straight from the parquet fixture, so a row
 * lost, duplicated, or re-typed by ANY format's write→read loop
 * hash-fails.
 *
 * Deliberately integer-only columns: a float SUM is
 * order-of-summation dependent and text formats re-parse doubles, so
 * exactness would be accidental; keys + a flag string make the
 * checksum bit-portable.
 *
 * Scale shape: one write + one scan + one group-less aggregate per
 * format — embarrassingly parallel, no shuffles beyond the 4-row
 * union. In deployment the write targets object storage; here a temp
 * dir with mode=overwrite keeps benches from accumulating files.
 */
object Formats {

  private val Fields = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_returnflag")

  private val ReadSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_returnflag", StringType)))

  /** Formats under test; parquet rides along as the control. */
  val RoundtripFormats: Seq[String] = Seq("csv", "json", "orc", "parquet")

  /** Per-PROCESS scratch root: a fixed shared path would let two
    * concurrent sessions (a gate bench + a spec run) clobber each
    * other's files mid-read; one unique root per JVM keeps repeated
    * bench reps from accumulating dirs (mode=overwrite reuses it)
    * while isolating processes. */
  private lazy val ScratchRoot: java.io.File = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-format-roundtrip").toFile
    d.deleteOnExit()
    d
  }

  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // deterministic 1/10 slice: the pin is FORMAT FIDELITY, not IO
    // volume — a lossy/re-typing loop fails on any slice, and the
    // bench shouldn't be dominated by writing the same rows 4 times
    val slice = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select(Fields.map(col): _*)
    val root = ScratchRoot
    val perFormat = RoundtripFormats.map { fmt =>
      val path = new java.io.File(root, fmt).toString
      val w = slice.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      val r = spark.read.format(fmt).schema(ReadSchema)
      val back = (if (fmt == "csv") r.option("header", "true") else r)
        .load(path)
      back.agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_orderkey")).as("sum_orderkey"),
          sum(col("l_partkey")).as("sum_partkey"),
          sum(col("l_linenumber").cast("long")).as("sum_linenumber"),
          countDistinct(col("l_returnflag")).as("n_flags"))
        .select(lit(fmt).as("format"), col("n_rows"), col("sum_orderkey"),
          col("sum_partkey"), col("sum_linenumber"), col("n_flags"))
    }
    perFormat.reduce(_.unionByName(_)).orderBy("format")
  }

  /** The oracle side: the identical checksums per format, computed
    * once from the parquet fixture (equality proves every format's
    * write→read loop lossless and type-exact). */
  def formatRoundtripSql: String = {
    val one = """SELECT '%s' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey,
      |  CAST(SUM(l_partkey) AS BIGINT) AS sum_partkey,
      |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber,
      |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags
      |FROM lineitem WHERE l_orderkey %% 10 = 0""".stripMargin
    RoundtripFormats.sorted.map(f => one.format(f))
      .mkString("", "\nUNION ALL\n", "\nORDER BY format")
  }
}
