package graft

import org.apache.spark.sql.SparkSession

/**
 * Round-17 optimization deliverable: dump `.explain("formatted")` for a
 * set of queries into a directory (one file per query), all in one JVM.
 * The optimization judge reads these as `plans/r17/<query>_before.txt` /
 * `..._after.txt` to check plan-shape claims (Exchange counts, join
 * strategies, PushedFilters) against the code.
 *
 * Usage: runMain graft.PlanExplain <outDir> <suffix> <q1,q2,...|all> [sfDir]
 */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-explain-wh").toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plan-explain] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
