package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * The reference's declared-but-never-wired Kinesis destination
 * (SURVEY.md §2.2 K1; the put site is a comment at reference
 * app/hs_contacts.py:118-122) as a real sink contract:
 *
 *  - records serialize to JSON and batch at the Kinesis `PutRecords`
 *    API limit (500 records / call);
 *  - failed subsets retry with bounded backoff — the reference's W4/W5
 *    retry-forever + fixed 10 s sleeps (app/hs_contacts.py:97-137)
 *    made finite and injectable;
 *  - the transport is behind [[KinesisClient]] so the zero-egress build
 *    tests the batching/retry machinery against a fake; a production
 *    build implements it with the AWS SDK and nothing else changes.
 *
 * Per-partition sending happens on executors (`foreachPartition`) — no
 * driver-side collect; at 1000 executors this is 1000 concurrent
 * writers, the Kinesis shard count being the real throttle.
 */
object KinesisSink {

  /** Minimal transport: returns the indices of records that failed
    * (mirrors PutRecords' per-record failure reporting). */
  trait KinesisClient extends Serializable {
    def putRecords(streamName: String, records: Seq[Array[Byte]]): Seq[Int]
  }

  final class RetriesExhausted(msg: String) extends RuntimeException(msg)

  /** Batching/backoff policy (defaults = Kinesis API limit + the
    * reference's 10 s backoff, but finite). */
  final case class Policy(
      maxBatch: Int = 500,
      maxRetries: Int = 5,
      backoffMs: Long = 10000L,
      sleep: Long => Unit = Thread.sleep)

  /** Send one batch with bounded retry of the failed subset. */
  private[streaming] def sendBatch(
      client: KinesisClient, stream: String,
      batch: Seq[Array[Byte]], policy: Policy): Unit = {
    var pending = batch
    var attempt = 0
    while (pending.nonEmpty) {
      val failed = client.putRecords(stream, pending)
      if (failed.isEmpty) return
      attempt += 1
      if (attempt > policy.maxRetries)
        throw new RetriesExhausted(
          s"${failed.size} records still failing after ${policy.maxRetries} retries")
      pending = failed.map(pending)
      policy.sleep(policy.backoffMs) // W5: rate-limit backoff, bounded
    }
  }

  /** Serialize a batch DataFrame to JSON lines and put per partition —
    * usable directly as a `foreachBatch` body or via
    * [[MicroBatch.EventSink]]. */
  def write(client: KinesisClient, stream: String, policy: Policy)(
      batch: DataFrame): Unit =
    batch.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.map(_.getBytes("UTF-8")).grouped(policy.maxBatch)
        .foreach(g => sendBatch(client, stream, g.toSeq, policy))
    }

  /** EventSink adapter for [[MicroBatch.start]]. */
  final class KinesisEventSink(client: KinesisClient, stream: String,
      policy: Policy = Policy()) extends MicroBatch.EventSink {
    def write(batch: DataFrame, batchId: Long): Unit =
      KinesisSink.write(client, stream, policy)(batch)
  }
}
