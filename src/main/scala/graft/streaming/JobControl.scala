package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Control plane for ingestion jobs — the reference's Flask
 * start/stop/check service (SURVEY.md §2.4 C2–C5; reference
 * app/app.py:62-116) re-expressed over the StreamingQueryManager
 * instead of `subprocess` + `ps` parsing. The auth filter (C1) is an
 * HTTP-layer concern, intentionally out of engine scope.
 */
object JobControl {

  final case class JobStatus(
      name: String,
      id: String,
      isActive: Boolean,
      batchesCompleted: Long,
      message: String)

  private def find(spark: SparkSession, name: String): Option[StreamingQuery] =
    spark.streams.active.find(_.name == name)

  /** C2: a job is just a named StreamingQuery; `start` is delegated to
    * the pipeline builders (MicroBatch.start). This checks liveness the
    * way the reference re-checked `ps` after Popen. */
  def isRunning(spark: SparkSession, name: String): Boolean =
    find(spark, name).exists(_.isActive)

  /** C3: graceful stop by name (vs the reference's `kill -9`). */
  def stop(spark: SparkSession, name: String): Boolean =
    find(spark, name) match {
      case Some(q) => q.stop(); true
      case None => false
    }

  /** C4: job status from the query's own progress, not `ps | grep`. */
  def status(spark: SparkSession, name: String): Option[JobStatus] =
    find(spark, name).map { q =>
      JobStatus(
        name = q.name,
        id = q.id.toString,
        isActive = q.isActive,
        batchesCompleted = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L),
        message = q.status.message)
    }

  /** C5: health = the session and its streaming manager are up. */
  def healthy(spark: SparkSession): Boolean =
    !spark.sparkContext.isStopped

  /** Stop every active job (shutdown hook material). */
  def stopAll(spark: SparkSession): Int = {
    val active = spark.streams.active
    active.foreach(_.stop())
    active.length
  }
}
