package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest SF: JIT + codegen cache + parquet
    // footer reads, so timed numbers measure the plans, not JVM startup.
    val warmupDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmupDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // min-of-N reps per query: host contention inflates individual runs
    // uniformly (BENCH_r02 recorded 5-13x noise on untouched queries);
    // the minimum is the contention-resistant estimate of the plan's
    // actual cost
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val dt = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        // queries may cache intermediates; drop them so later queries
        // aren't timed under accumulated memory pressure
        spark.catalog.clearCache()
        t
      }.min
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
