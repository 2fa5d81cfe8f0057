package graft.plans

import graft.SparkEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/**
 * Physical-plan dump for offline review: writes `explain("formatted")`
 * output for every registered query (or a named subset) so the
 * scale-shape claims in SCALE.md can be checked against the actual
 * plans without a REPL.
 *
 * Usage: `sbt 'runMain graft.plans.PlanDump <sfDir> <outDir> [q1,q2]'`
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/plans"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          // the PlanChecks audit line the plan-quality spec asserts on —
          // exchanges/joins/pushdown at a glance above the full plan
          val audit = PlanChecks.audit(df).toString
          Files.writeString(Paths.get(s"$outDir/$name.txt"),
            s"$audit\n\n$plan")
        } catch {
          case e: Throwable =>
            Files.writeString(Paths.get(s"$outDir/$name.txt"),
              s"PLAN FAILED: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
