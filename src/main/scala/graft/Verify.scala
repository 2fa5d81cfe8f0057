package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // managed tables (the bucketed-layout queries) land in a temp
      // warehouse, never the checkout; deleted after spark.stop()
      .config("spark.sql.warehouse.dir", Bench.tempWarehouse())
      // release dead per-serve checkpoint pins during the run (see
      // Bench: the 30 min default never fires inside one invocation)
      .config("spark.cleaner.periodicGC.interval", "2min")
      // engine-wide extensions, exactly as a deployed session would run:
      // custom functions + TopKPerKey strategy + the InferTopKPerKey
      // rewrite apply to EVERY query, not just per-query opt-ins
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Failures must be LOUD in the artifacts: a query that throws would
    // otherwise just be missing its output dir and silently vanish from
    // the driver's correctness compare (round 8: 37 broken queries read
    // as "127/127 green"). Collect every failure and write failed.json
    // next to oracle_sql.json, and print the count on stdout/stderr.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // queries may cache intermediates
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failedJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v.take(300))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failed.json"), failedJson)
    println(s"[verify] n_failed=${failed.size} of ${SparkEntry.queries.size}" +
      (if (failed.nonEmpty) s" FAILED: ${failed.keys.mkString(",")}" else ""))
    // exit 0 even on failures: the driver must still run the DuckDB
    // compare over the queries that DID produce output; failed.json +
    // the stdout count are the loud signal.
    spark.stop()
    Bench.deleteTempWarehouse()
  }
}
