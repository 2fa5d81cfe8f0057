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
    // deleteOnExit() only removes EMPTY directories — sweep the whole
    // tree on JVM exit so bench/gate/spec runs don't each leak one
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.model.Fs.deleteRecursively(d.toPath)))
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

  private val StringTrapSchema = StructType(Seq(
    StructField("key", LongType),
    StructField("s", StringType)))

  /** The 8 planted trap classes, keyed by `key % 8` — identical
    * derivations on both engines (see [[stringTrap]]). The BEL-prefixed
    * sentinel makes NULLs positionally visible in the fingerprint
    * without colliding with any trap's content; the SOH separator
    * (chr(1) in the oracle) can't either. */
  private val NullSentinel = "\u0007NULL"

  private def stringTrap(key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(key % 8 === 0, "a,b,c")                  // delimiter commas
      .when(key % 8 === 1, "He said \"hi, there\"") // embedded quotes
      .when(key % 8 === 2, "line1\nline2")        // embedded newline
      .when(key % 8 === 3, "")                    // empty (≠ NULL)
      .when(key % 8 === 4, lit(null).cast("string")) // NULL (≠ empty)
      .when(key % 8 === 5, "héllo wörld 世界")     // multi-byte unicode
      .when(key % 8 === 6, "  padded  ")          // leading/trailing spaces
      .otherwise("tab\tsep")                      // embedded tab

  /**
   * String-trap round-trip (q256): [[formatRoundtrip]] pins TYPE
   * fidelity on integer columns; this pins CONTENT fidelity on the
   * column class text formats actually corrupt — strings. Each
   * (l_orderkey, l_linenumber) key in a deterministic lineitem slice
   * derives a planted trap by `key % 8`: delimiter commas, embedded
   * double quotes, an embedded newline, the empty string, NULL,
   * multi-byte unicode, leading/trailing padding, an embedded tab.
   * Every format writes and reads the traps through its real
   * FileFormat, reduced to oracle-expressible checksums: row/null/
   * empty counts, total char length, and an order-pinned md5
   * fingerprint of the whole column (NULLs sentinel-visible). The
   * DuckDB oracle re-derives the SAME traps straight from the fixture,
   * so any corruption — a mis-quoted comma splitting a row, a
   * swallowed newline, empty collapsing into NULL, trimmed padding,
   * mojibake — hash-fails on that format's row.
   *
   * The CSV leg encodes the production discipline this query exists to
   * pin: `multiLine` on read (embedded newlines; NOTE a multiLine CSV
   * file is not splittable — at 100 TB keep such files small or use a
   * binary format), an explicit `nullValue` token distinct from ''
   * (the default '' conflates NULL with empty on read-back), and
   * writer-side whitespace trimming OFF (the writer default silently
   * strips padded values). BMP-only unicode by design: Spark's
   * length() counts UTF-16 units, DuckDB's counts codepoints — equal
   * only below the astral plane, so the fingerprint stays portable.
   */
  def formatRoundtripStrings(spark: SparkSession, dir: String): DataFrame = {
    val slice = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 50 === 0)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
        .as("key"))
      .withColumn("s", stringTrap(col("key")))
    val root = ScratchRoot
    val perFormat = RoundtripFormats.map { fmt =>
      val path = new java.io.File(root, s"str_$fmt").toString
      val w = slice.write.mode("overwrite").format(fmt)
      (if (fmt == "csv")
        w.option("header", "true").option("nullValue", "\\N")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
      else w).save(path)
      val r = spark.read.format(fmt).schema(StringTrapSchema)
      val back = (if (fmt == "csv")
        r.option("header", "true").option("nullValue", "\\N")
          .option("multiLine", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
      else r).load(path)
      back.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("s").isNull, 1L).otherwise(0L)).as("n_nulls"),
          sum(when(col("s") === "", 1L).otherwise(0L)).as("n_empty"),
          sum(length(col("s")).cast("long")).as("sum_len"),
          md5(concat_ws("\u0001",
            transform(array_sort(collect_list(struct(col("key"), col("s")))),
              x => coalesce(x.getField("s"), lit(NullSentinel)))))
            .as("fingerprint"))
        .select(lit(fmt).as("format"), col("n_rows"), col("n_nulls"),
          col("n_empty"), col("sum_len"), col("fingerprint"))
    }
    perFormat.reduce(_.unionByName(_)).orderBy("format")
  }

  /** The markup-trap classes for the XML leg, keyed by `key % 8`.
    * XML's corruption class is ESCAPING (bare `<`/`&`, an entire
    * element as text content, the CDATA terminator), not quoting —
    * so the traps differ from [[stringTrap]]'s CSV set. No
    * empty-string class ON PURPOSE: without xsi:nil an absent element
    * and a present-but-empty one are the same document, so XML
    * conflates ''→NULL by design — q256's CSV/JSON legs pin that
    * distinction where the format can carry it. */
  private def xmlTrap(key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(key % 8 === 0, "a < b & c > d")              // bare markup chars
      .when(key % 8 === 1, "<tag attr=\"v\">x</tag>") // an element AS TEXT
      .when(key % 8 === 2, "cdata ]]> terminator")    // CDATA terminator
      .when(key % 8 === 3, "line1\nline2")            // embedded newline
      .when(key % 8 === 4, lit(null).cast("string"))  // NULL (absent element)
      .when(key % 8 === 5, "héllo wörld 世界")         // multi-byte unicode
      .when(key % 8 === 6, "  padded  ")              // surrounding spaces
      .otherwise("tab\tsep & more")                   // tab + entity mix

  /**
   * XML sink/source round-trip (q259): Spark 4 ships the XML
   * datasource natively, and its corruption class is different in
   * kind from CSV's — mis-ESCAPED markup characters leak structure
   * into content (a bare `<` truncates the element; an unescaped
   * `]]>` closes a CDATA section early; `&` starts an entity) — so
   * the planted traps are markup, not delimiters. The same
   * deterministic lineitem key slice derives a trap per `key % 8`,
   * writes through the real XML FileFormat (explicit `rowTag`; the
   * writer must entity-escape every trap) and reads back with an
   * explicit schema, `ignoreSurroundingSpaces` pinned OFF (the read
   * default silently trims the padded class). Checksums mirror q256:
   * row/null counts, total char length, and the order-pinned md5
   * fingerprint with NULLs sentinel-visible — the DuckDB oracle
   * re-derives the traps from the fixture, so any escaping loss
   * (truncation at `<`, entity double-decode, swallowed newline,
   * trimmed padding) hash-fails.
   *
   * Scale note: XML files, like multiLine CSV, are not splittable by
   * newline — at 100 TB keep row-tag files bounded or land in a
   * binary format; this query pins FIDELITY of the interchange leg,
   * not its throughput.
   */
  def formatRoundtripXml(spark: SparkSession, dir: String): DataFrame = {
    val slice = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 50 === 0)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
        .as("key"))
      .withColumn("s", xmlTrap(col("key")))
    val path = new java.io.File(ScratchRoot, "xml").toString
    slice.write.mode("overwrite").format("xml")
      .option("rowTag", "r").save(path)
    val back = spark.read.format("xml").schema(StringTrapSchema)
      .option("rowTag", "r")
      .option("ignoreSurroundingSpaces", "false")
      .load(path)
    back.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("s").isNull, 1L).otherwise(0L)).as("n_nulls"),
        sum(length(col("s")).cast("long")).as("sum_len"),
        md5(concat_ws("\u0001",
          transform(array_sort(collect_list(struct(col("key"), col("s")))),
            x => coalesce(x.getField("s"), lit(NullSentinel)))))
          .as("fingerprint"))
      .select(lit("xml").as("format"), col("n_rows"), col("n_nulls"),
        col("sum_len"), col("fingerprint"))
  }

  /** The q259 oracle: the same markup traps and checksums computed
    * once from the parquet fixture. */
  def formatRoundtripXmlSql: String =
    """WITH t AS (SELECT l_orderkey * 10 + l_linenumber AS key,
      |    CASE (l_orderkey * 10 + l_linenumber) % 8
      |      WHEN 0 THEN 'a < b & c > d'
      |      WHEN 1 THEN '<tag attr="v">x</tag>'
      |      WHEN 2 THEN 'cdata ]]> terminator'
      |      WHEN 3 THEN 'line1' || chr(10) || 'line2'
      |      WHEN 4 THEN NULL
      |      WHEN 5 THEN 'héllo wörld 世界'
      |      WHEN 6 THEN '  padded  '
      |      ELSE 'tab' || chr(9) || 'sep & more' END AS s
      |  FROM lineitem WHERE l_orderkey % 50 = 0)
      |SELECT 'xml' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_nulls,
      |  CAST(SUM(length(s)) AS BIGINT) AS sum_len,
      |  md5(string_agg(coalesce(s, chr(7) || 'NULL'), chr(1)
      |    ORDER BY key)) AS fingerprint
      |FROM t""".stripMargin

  /** The q256 oracle: the same trap derivation and checksums computed
    * once from the parquet fixture per format row. */
  def formatRoundtripStringsSql: String = {
    val one = """SELECT '%s' AS format, n_rows, n_nulls, n_empty, sum_len,
      |  fingerprint FROM a""".stripMargin
    """WITH t AS (SELECT l_orderkey * 10 + l_linenumber AS key,
      |    CASE (l_orderkey * 10 + l_linenumber) % 8
      |      WHEN 0 THEN 'a,b,c'
      |      WHEN 1 THEN 'He said "hi, there"'
      |      WHEN 2 THEN 'line1' || chr(10) || 'line2'
      |      WHEN 3 THEN ''
      |      WHEN 4 THEN NULL
      |      WHEN 5 THEN 'héllo wörld 世界'
      |      WHEN 6 THEN '  padded  '
      |      ELSE 'tab' || chr(9) || 'sep' END AS s
      |  FROM lineitem WHERE l_orderkey % 50 = 0),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_nulls,
      |    CAST(SUM(CASE WHEN s = '' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_empty,
      |    CAST(SUM(length(s)) AS BIGINT) AS sum_len,
      |    md5(string_agg(coalesce(s, chr(7) || 'NULL'), chr(1)
      |      ORDER BY key)) AS fingerprint
      |  FROM t)
      |""".stripMargin +
      RoundtripFormats.sorted.map(f => one.format(f))
        .mkString("", "\nUNION ALL\n", "\nORDER BY format")
  }
}
