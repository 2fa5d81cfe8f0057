package graft.plans

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/**
 * Manual plan inspection: `sbt 'runMain graft.plans.PlanDump [sfDir]
 * [query...]'` prints the formatted physical plan plus the
 * [[PlanChecks]] audit line for each named query (default: a
 * representative set).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q01_incremental_scan", "q12_revenue_topk", "q26_snowflake_revenue",
      "q28_asof_join", "q32_minhash_lsh", "q34_cosine_topk",
      "q100_rank_rewrite", "q101_incremental_dedup")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      println(s"\n================ $n ================")
      println(s"audit: ${PlanChecks.audit(df)}")
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
