package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ArtifactMaintenanceSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("streamed partials fold to the same LM counts as a batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val artifact = freshDir("lm-artifact")
    val q = ArtifactMaintenance
      .maintainLm(input.toDF().toDF("doc_id", "text"), artifact)
      .option("checkpointLocation", freshDir("lm-ckpt"))
      .start()
    try {
      input.addData((1L, "a b c"), (2L, "b c d"))
      q.processAllAvailable()
      input.addData((3L, "a b c"), (4L, "x"))
      q.processAllAvailable()
    } finally q.stop()

    val docs = Seq((1L, "a b c"), (2L, "b c d"), (3L, "a b c"), (4L, "x"))
      .toDF("doc_id", "text")
    val direct = ArtifactMaintenance.batchBigramCounts(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = ArtifactMaintenance.lmCounts(spark, artifact)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == direct)
    // ("b","c") seen in three docs across two batches
    assert(streamed(("b", "c")) == 3L)

    // a REPLAYED batch (crash between partition write and checkpoint
    // commit) overwrites its own partition — counts must not change
    ArtifactMaintenance.batchBigramCounts(
        Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$artifact/batch_id=0")
    val replayed = ArtifactMaintenance.lmCounts(spark, artifact)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(replayed == direct, "batch replay double-counted")

    // compaction folds partials into one baseline with identical counts
    ArtifactMaintenance.compactLm(spark, artifact)
    val compacted = ArtifactMaintenance.lmCounts(spark, artifact)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(compacted == direct)
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(artifact))
      .iterator()
    val dirs = new scala.collection.mutable.ListBuffer[String]
    while (parts.hasNext) dirs += parts.next().getFileName.toString
    assert(dirs.count(_.startsWith("batch_id=")) == 1, dirs)
  }
}
