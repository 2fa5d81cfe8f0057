package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main (not part of the library): prints the
  * formatted physical plan of selected queries for review. */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q01_incremental_scan", "q12_revenue_topk", "q26_snowflake_revenue",
      "q28_asof_join", "q32_minhash_lsh", "q34_cosine_topk", "q05_tumbling_window")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
