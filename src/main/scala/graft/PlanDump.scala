package graft

import org.apache.spark.sql.SparkSession

/**
 * Gate diagnostic: render ONE query's normalized physical-plan text
 * (the exact string [[PlanShapes]] hashes) so a fingerprint flip can
 * be diffed instead of guessed at. Used to triage the q163/q247
 * run-to-run flips (round-17, ADVICE item #2): run twice, diff the
 * two outputs, read the changed operator.
 *
 * Usage: runMain graft.PlanDump <queryName> [sfDir] [outPath]
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 2) args(2) else s"/tmp/plan_$name.txt"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-dump-wh").toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // render + normalize ONCE and hash THAT string — the printed md5
    // must be the hash of the dumped text by construction, never a
    // second render that could drift (the PlanShapes.main discipline)
    val normalized =
      PlanShapes.normalize(df.queryExecution.executedPlan.toString)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      normalized.getBytes("UTF-8"))
    println(s"[plan-dump] $name -> $outPath (md5 ${PlanShapes.md5hex(normalized)})")
    spark.stop()
  }
}
