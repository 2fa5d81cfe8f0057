package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Reproducible measurement behind the layout family's 100 TB claim:
 * writes the three candidate layouts (hilbert / zorder / lex) of
 * lineitem's masked keys as real multi-file parquet, then runs the
 * fixed ZonePreds workload as pushed scans and prints, per
 * (layout, pred): rows the parquet reader materialized (post row-group
 * pruning), rows matching, total rows, and the zone-map prediction —
 * the numbers SCALE.md records and LayoutEndToEndSpec pins equal.
 *
 * Usage: runMain graft.LayoutMeasure [sfDir] [nFiles]
 */
object LayoutMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nFiles = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-layout-measure")
    try {
      val paths = graft.ops.Layout.writeLayouts(spark, sfDir, out.toString, nFiles)
      val predsDf = graft.ops.Layout.ZonePreds
        .toDF("pred_id", "px_lo", "px_hi", "py_lo", "py_hi")
      val lines = Seq("hilbert", "zorder", "lex").flatMap { name =>
        val path = paths(name)
        val zones = graft.ops.Layout.fileZones(spark, path, name)
        val predicted = graft.ops.Layout.pruneStats(zones, predsDf).collect()
          .map(r => r.getAs[Int]("pred_id") ->
            (r.getAs[Long]("buckets_scanned"), r.getAs[Long]("rows_scanned")))
          .toMap
        val total = spark.read.parquet(path).count()
        graft.ops.Layout.ZonePreds.map { case pred @ (id, _, _, _, _) =>
          val (rowsRead, matching, files) =
            graft.ops.Layout.measuredScan(spark, path, pred)
          val (bPred, rPred) = predicted(id)
          val pct = 100.0 * rowsRead / total
          f"""{"layout":"$name","pred":$id,"rows_read":$rowsRead,""" +
            f""""predicted":$rPred,"matching":$matching,"total":$total,""" +
            f""""files":$files,"buckets_hit":$bPred,"read_pct":$pct%.2f}"""
        }
      }
      lines.foreach(println)
    } finally {
      val walk = java.nio.file.Files.walk(out)
      val files = try {
        val it = walk.iterator()
        val b = List.newBuilder[java.nio.file.Path]
        while (it.hasNext) b += it.next()
        b.result()
      } finally walk.close()
      files.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      spark.stop()
    }
  }
}
