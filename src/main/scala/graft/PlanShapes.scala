package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-query PLAN FINGERPRINTS for the regression gate (round-13
 * verdict #3): a bench regression flag is only acceptable as
 * "host/re-measurement variance" when the query's physical plan is
 * UNCHANGED — a flag that coincides with a plan-shape change is a real
 * regression no ledger entry may wave through. This main renders every
 * query's (unexecuted) physical plan at the smallest fixture, strips
 * run-dependent noise (expression ids, plan ids, file paths, object
 * hashes), and emits one JSON line of {"query": "md5-of-shape"}.
 *
 * tools/closing_gate.sh compares fresh fingerprints against
 * tools/plan_shapes.json for every flagged regression — ratio breach
 * AND hash change fails the gate regardless of the ledger — and
 * refreshes the stored file after a green run, so the baseline is
 * always "the plan of the last green round".
 *
 * Usage: runMain graft.PlanShapes [sfDir] [outPath]
 */
object PlanShapes {

  /** Run-dependent noise stripped from a plan rendering. The result is
    * stable across JVMs for the same code + fixture. */
  private[graft] def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+", "#")                     // expression ids
      .replaceAll("plan_id=\\d+", "plan_id=")       // AQE plan ids
      .replaceAll("@[0-9a-f]{6,}", "@")             // object hashes
      .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda") // JVM lambda ids
      .replaceAll("splits=\\d+", "splits=") // Range splits = core count
      .replaceAll("file:[^\\s\\],)]*", "path")       // local paths
      // ANY multi-segment absolute path, not just well-known roots: a
      // host whose java.io.tmpdir sits outside testdata/tmp/warehouse
      // (e.g. /var/folders/... on macOS) must normalize identically,
      // or scratch-writing queries would fingerprint per-run
      .replaceAll("/[-_A-Za-z0-9.]+(?:/[-_A-Za-z0-9.]+)+", "path")
      .replaceAll("/[-_A-Za-z0-9./]*(testdata|tmp|warehouse)[^\\s\\],)]*", "path")
      .replaceAll("InMemoryFileIndex\\([^)]*\\)\\[[^\\]]*\\]", "FileIndex")
      .replaceAll("Location: [^\\n]*", "Location: path")
      .replaceAll("\\[id=#\\]", "")

  private[graft] def fingerprint(plan: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalize(plan).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 1) args(1) else "/tmp/plan_shapes.json"
    // shuffle width is PINNED, not env-derived: partition counts render
    // into plan strings (rangepartitioning(x, 32)), so a fingerprint
    // taken at 16 CPUs would spuriously differ from one taken at 32 —
    // the gate would then misread host-config drift as a plan change.
    // 32 matches the driver's bench session.
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-shapes-wh").toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shapes = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val fp = try {
        val df = fn(spark, sfDir)
        fingerprint(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable =>
        // class name only: exception MESSAGES carry quotes/backslashes
        // (would corrupt the hand-built JSON) and host paths (would
        // make an ERR state spuriously "change plan" across hosts)
        "ERR:" + e.getClass.getSimpleName
      }
      name -> fp
    }.sortBy(_._1)
    val json = shapes.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"[plan-shapes] wrote ${shapes.size} fingerprints to $outPath")
    spark.stop()
  }
}
