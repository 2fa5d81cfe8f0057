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

  /** Batching/backoff policy (defaults = Kinesis PutRecords API limits
    * — 500 records / 5 MiB per call — + the reference's 10 s backoff,
    * but finite). [[FirehoseSink.policy]] tightens the byte cap to the
    * PutRecordBatch limit. */
  final case class Policy(
      maxBatch: Int = 500,
      maxRetries: Int = 5,
      backoffMs: Long = 10000L,
      sleep: Long => Unit = Thread.sleep,
      maxBatchBytes: Long = 5L * 1024 * 1024)

  /** Size-aware batching: consecutive records chunk at WHICHEVER cap
    * hits first — record count or cumulative bytes (both APIs bound
    * both). A single record larger than `maxBytes` gets its own chunk
    * here and fails loudly at the client's record-size check — never a
    * silent drop. */
  private[streaming] def chunks(it: Iterator[Array[Byte]],
      maxRecords: Int, maxBytes: Long): Iterator[Seq[Array[Byte]]] =
    new Iterator[Seq[Array[Byte]]] {
      private val buf = it.buffered
      override def hasNext: Boolean = buf.hasNext
      override def next(): Seq[Array[Byte]] = {
        val out = Seq.newBuilder[Array[Byte]]
        var n = 0
        var bytes = 0L
        while (buf.hasNext && n < maxRecords &&
            (n == 0 || bytes + buf.head.length <= maxBytes)) {
          val r = buf.next()
          out += r; n += 1; bytes += r.length
        }
        out.result()
      }
    }

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
      chunks(it.map(_.getBytes("UTF-8")), policy.maxBatch, policy.maxBatchBytes)
        .foreach(g => sendBatch(client, stream, g, policy))
    }

  /** EventSink adapter for [[MicroBatch.start]]. */
  final class KinesisEventSink(client: KinesisClient, stream: String,
      policy: Policy = Policy()) extends MicroBatch.EventSink {
    def write(batch: DataFrame, batchId: Long): Unit =
      KinesisSink.write(client, stream, policy)(batch)
  }

  /**
   * KPL-style producer aggregation ahead of the put path: pack up to
   * `maxPerAggregate` consecutive JSON records (bounded by
   * `maxAggregateBytes`, the 1 MiB Kinesis record ceiling minus
   * framing) into one [[graft.sources.Kpl]] aggregate per put record.
   * This is how real deployments beat the 1000 records/s/shard
   * PutRecords ceiling; the matching consumer side is the source's
   * KCL-contract de-aggregation, so the two ends of this repo form a
   * complete loop a spec can drive offline. Partition key = the
   * constant the caller routes by (per-record keys ride INSIDE the
   * aggregate, exactly as the KPL does).
   */
  /** The Kinesis per-record ceiling the aggregate must fit inside. */
  val KinesisRecordLimit: Long = 1024L * 1024

  /** Worst-case bytes [[graft.sources.Kpl.aggregate]] adds on top of
    * the summed user payloads: magic (4) + MD5 trailer (16) + the
    * single-entry key table (field header ≤ 6 + key bytes) + per
    * record ≤ 23 bytes of protobuf framing (outer field header ≤ 6,
    * partition_key_index ≤ 11, data field header ≤ 6). Deliberately a
    * conservative CONFIG-TIME envelope: it charges the worst case per
    * admitted record, so an extreme-but-valid config (huge
    * maxPerAggregate, tiny records) is rejected at the seam even
    * though its actual aggregates might fit — the safe failure mode.
    * If that ever bites a real deployment, enforce the framed size per
    * emitted aggregate at chunk time instead. */
  private[streaming] def aggregateOverhead(
      maxPerAggregate: Int, partitionKey: String): Long =
    20L + 6L + partitionKey.getBytes("UTF-8").length +
      23L * maxPerAggregate

  def writeAggregated(client: KinesisClient, stream: String,
      policy: Policy, partitionKey: String,
      maxPerAggregate: Int = 100,
      maxAggregateBytes: Long = 1000L * 1024)(batch: DataFrame): Unit = {
    // `maxAggregateBytes` bounds only the summed USER payload bytes;
    // the emitted Kinesis record adds magic + MD5 + protobuf framing +
    // the key table. Enforce the envelope at the seam: payload cap +
    // worst-case framing must fit the 1 MiB record ceiling. The
    // subtraction form cannot overflow (the addition form wraps
    // negative for a huge maxAggregateBytes and silently passes —
    // the same Long-overflow pattern Kpl.lengthDelimited refuses).
    require(maxAggregateBytes >= 0 &&
        aggregateOverhead(maxPerAggregate, partitionKey) <=
          KinesisRecordLimit - maxAggregateBytes,
      s"maxAggregateBytes=$maxAggregateBytes plus worst-case KPL framing " +
        s"${aggregateOverhead(maxPerAggregate, partitionKey)} exceeds the " +
        s"$KinesisRecordLimit-byte Kinesis record limit")
    batch.toJSON.foreachPartition { (it: Iterator[String]) =>
      // The config guard above can't cover DATA: chunks() admits any
      // FIRST record regardless of size, so one oversized row would
      // emit an over-limit aggregate that a real transport rejects on
      // every retry — a permanent poison pill replayed by every task
      // retry. Refuse it loudly, identifying the row by DIGEST, not
      // content — executor logs are not a place for payload bytes in
      // a pipeline that otherwise leak-checks (the FirehoseSink
      // per-record precedent applied to the KPL path).
      val sized = it.map { s =>
        val b = s.getBytes("UTF-8")
        require(b.length <= maxAggregateBytes,
          s"a single record of ${b.length} bytes exceeds " +
            s"maxAggregateBytes=$maxAggregateBytes and cannot fit a " +
            "Kinesis record once framed; md5=" +
            java.security.MessageDigest.getInstance("MD5").digest(b)
              .map("%02x".format(_)).mkString)
        b
      }
      val blobs = chunks(sized, maxPerAggregate, maxAggregateBytes)
        .map(g => graft.sources.Kpl.aggregate(
          g.map(graft.sources.Kpl.UserRecord(partitionKey, _))))
      chunks(blobs, policy.maxBatch, policy.maxBatchBytes)
        .foreach(g => sendBatch(client, stream, g, policy))
    }
  }
}

/**
 * Exactly-once delivery over the at-least-once Kinesis/Firehose APIs
 * (round-14 verdict #4) — the idempotent-producer emulation at the
 * seam: neither PutRecords nor PutRecordBatch is transactional, so a
 * crash after a partially-acked call makes the replayed micro-batch
 * re-send records the stream already has. The fix is the repo's
 * manifest discipline applied to the sink: a batchId-keyed COMMITTED
 * ledger of (partition, chunk) markers, committed conditionally AFTER
 * each chunk's ack, so a replayed batch skips chunks the previous
 * attempt already delivered. Sequential task retries dedup the same
 * way (the retry reads the committed markers).
 *
 * The guarantee is conditional on the foreachBatch replay contract
 * Structured Streaming already provides: a restarted query re-delivers
 * the SAME batchId with the SAME rows (replayable source + checkpoint)
 * — the identical precondition Delta's `txn` dedup assumes. The ledger
 * does not trust it blindly: each marker pins the chunk's record count
 * and content md5, and a replay whose chunk differs from the acked one
 * fails LOUDLY instead of silently skipping different data.
 *
 * The irreducible at-least-once window is a chunk whose send was acked
 * but whose marker is not yet committed. Two paths land in it:
 *  - a CRASH between the transport ack and the marker commit re-sends
 *    that single chunk on replay (proven one chunk wide by the
 *    crash-point enumeration spec);
 *  - CONCURRENT attempts of one partition within one batch (task
 *    speculation, a zombie task racing its replacement) can both pass
 *    the marker read-miss and both send a chunk before either commits.
 * In both cases the marker itself stays intact: commits go through
 * [[graft.model.Fs.MarkerStore.putIfAbsent]] (per-attempt staging +
 * conditional create), so exactly one attempt publishes a complete
 * marker, the loser verifies it committed the IDENTICAL chunk (a
 * different chunk is replay divergence and fails loudly), and no
 * reader ever sees a truncated signature. Closing the window entirely
 * needs a transactional sink, which Kinesis does not offer; everything
 * outside it is exactly-once. Deployments that want the window to be
 * crash-only can set `spark.speculation=false` (the Spark default).
 *
 * At 1000 executors the ledger is one tiny marker per (batch,
 * partition, chunk) on shared storage. The commit primitive is the
 * pluggable [[graft.model.Fs.MarkerStore]]: the default
 * [[graft.model.Fs.PosixMarkerStore]] requires POSIX/HDFS atomic
 * namespace semantics; on S3-family object stores (no atomic rename)
 * implement the trait over a conditional put (`If-None-Match: *`) —
 * the analysis above holds for any implementation honoring the trait
 * contract, which the spec proves against a conditional-put fake.
 * `prune` retires ledgers at or below the checkpoint's committed
 * watermark.
 */
object ExactlyOnceSink {
  import java.nio.file.Paths

  private def md5hex(gs: Seq[Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    gs.foreach(md.update)
    md.digest().map("%02x".format(_)).mkString
  }

  /** CRASH-POINT SEAM (the ManifestArtifact pattern): invoked with a
    * label at each externally visible boundary — after a chunk's
    * transport ack ("chunk-acked:<ci>") and after its marker commit
    * ("marker-committed:<ci>"). Production default is a no-op; the
    * crash-window spec swaps in a thrower to prove the documented
    * at-least-once window is EXACTLY the ack→marker gap of one chunk:
    * a crash anywhere else replays to exactly-once delivery. */
  private[streaming] var crashPoint: String => Unit = _ => ()

  /** foreachBatch body: ledgered, chunk-idempotent put. */
  def write(client: KinesisSink.KinesisClient, stream: String,
      policy: KinesisSink.Policy, ledgerDir: String,
      store: graft.model.Fs.MarkerStore = graft.model.Fs.PosixMarkerStore)(
      batch: DataFrame, batchId: Long): Unit =
    batch.toJSON.foreachPartition { (it: Iterator[String]) =>
      deliverPartition(client, stream, policy, ledgerDir, store,
        it, batchId, org.apache.spark.TaskContext.getPartitionId())
    }

  /** One partition's ledgered delivery — the foreachPartition body,
    * callable directly so the concurrent-attempt spec can race two
    * attempts of the SAME partition deterministically on plain
    * threads. */
  private[streaming] def deliverPartition(
      client: KinesisSink.KinesisClient, stream: String,
      policy: KinesisSink.Policy, ledgerDir: String,
      store: graft.model.Fs.MarkerStore,
      it: Iterator[String], batchId: Long, pid: Int): Unit = {
    val dir = Paths.get(ledgerDir, s"b$batchId", s"p$pid")
    store.ensureDir(dir)
    def divergence(ci: Int, prev: String, sig: String): Nothing =
      throw new IllegalStateException(
        s"replay divergence at batch $batchId partition $pid " +
          s"chunk $ci: acked [$prev] but replay produced [$sig] " +
          "— the source replayed DIFFERENT rows for a committed " +
          "chunk; refusing to skip (and to re-send) silently")
    var ci = 0
    KinesisSink.chunks(it.map(_.getBytes("UTF-8")),
        policy.maxBatch, policy.maxBatchBytes)
      .foreach { g =>
        val marker = dir.resolve(s"c$ci")
        val sig = s"${g.size} ${md5hex(g)}"
        store.read(marker) match {
          case Some(prevBytes) =>
            val prev = new String(prevBytes, "UTF-8").trim
            if (prev != sig) divergence(ci, prev, sig)
            // else: chunk already delivered by a prior attempt — skip
          case None =>
            KinesisSink.sendBatch(client, stream, g, policy)
            crashPoint(s"chunk-acked:$ci")
            store.putIfAbsent(marker, sig.getBytes("UTF-8")) match {
              case None => // we committed the marker
              case Some(winnerBytes) =>
                // A concurrent attempt committed first — both attempts
                // sent this chunk (the documented at-least-once
                // window), but the marker must pin the SAME chunk.
                val winner = new String(winnerBytes, "UTF-8").trim
                if (winner != sig) divergence(ci, winner, sig)
            }
            crashPoint(s"marker-committed:$ci")
        }
        ci += 1
      }
  }

  /** Retire ledger state for batches the checkpoint has committed:
    * Structured Streaming never replays a batchId at or below the
    * commit log's watermark, so those markers are unreachable. Runs
    * through the SAME [[graft.model.Fs.MarkerStore]] the markers were
    * committed with — a ledger whose markers live in an object store
    * must retire them THERE, not sweep empty local directories. */
  def prune(ledgerDir: String, upToBatchId: Long,
      store: graft.model.Fs.MarkerStore = graft.model.Fs.PosixMarkerStore)
      : Unit = {
    val root = Paths.get(ledgerDir)
    store.listBatches(root)
      .filter(_ <= upToBatchId)
      .foreach(b => store.deletePrefix(root.resolve(s"b$b")))
  }

  /** EventSink adapter for [[MicroBatch.start]] with automatic ledger
    * retention: after batch N completes, ledgers at or below
    * N − `retainBatches` are retired — Structured Streaming's replay
    * horizon is the last uncommitted batch, so a generous window
    * behind it is unreachable by any legal replay. Without this the
    * marker tree grows one directory per batch forever (the snapshot
    * history lesson, applied at the sink). */
  final class ExactlyOnceEventSink(client: KinesisSink.KinesisClient,
      stream: String, policy: KinesisSink.Policy, ledgerDir: String,
      retainBatches: Int = 100,
      store: graft.model.Fs.MarkerStore = graft.model.Fs.PosixMarkerStore)
      extends MicroBatch.EventSink {
    require(retainBatches >= 1, "must retain at least the previous batch")
    def write(batch: DataFrame, batchId: Long): Unit = {
      ExactlyOnceSink.write(client, stream, policy, ledgerDir, store)(
        batch, batchId)
      ExactlyOnceSink.prune(ledgerDir, batchId - retainBatches, store)
    }
  }
}

/**
 * The README's SECOND named destination (reference README.md:2:
 * "Kinesis Data Stream or Firehose Delivery Stream"): the Firehose
 * `PutRecordBatch` API has the same failed-subset reporting as
 * `PutRecords` — FailedPutCount + per-record error entries — so it
 * rides the identical bounded-retry machinery; what differs is the
 * call envelope: 500 records AND 4 MiB per call, 1000 KiB per record,
 * and no partition keys (Firehose buffers, it doesn't shard).
 * [[FirehoseSink.FirehoseClient]] adapts any PutRecordBatch-shaped
 * transport to the [[KinesisSink.KinesisClient]] contract and ENFORCES
 * the envelope at the seam — Firehose rejects an oversized request
 * wholesale, so an over-limit call is a caller bug that must fail
 * loud, not enter the retry loop.
 */
object FirehoseSink {
  val MaxRecordsPerCall = 500
  val MaxBytesPerCall: Long = 4L * 1024 * 1024
  val MaxRecordBytes: Long = 1000L * 1024

  /** PutRecordBatch-shaped transport: returns indices of failed
    * records (the FailedPutCount expansion). A production build
    * implements this over the AWS SDK; specs register fakes. */
  trait FirehoseTransport extends Serializable {
    def putRecordBatch(deliveryStream: String,
        records: Seq[Array[Byte]]): Seq[Int]
  }

  final class FirehoseClient(transport: FirehoseTransport)
      extends KinesisSink.KinesisClient {
    override def putRecords(streamName: String,
        records: Seq[Array[Byte]]): Seq[Int] = {
      require(records.size <= MaxRecordsPerCall,
        s"PutRecordBatch takes at most $MaxRecordsPerCall records, " +
          s"got ${records.size}")
      val bytes = records.iterator.map(_.length.toLong).sum
      require(bytes <= MaxBytesPerCall,
        s"PutRecordBatch call limit is $MaxBytesPerCall bytes, got $bytes")
      records.iterator.zipWithIndex.foreach { case (r, i) =>
        require(r.length <= MaxRecordBytes,
          s"Firehose record limit is $MaxRecordBytes bytes, " +
            s"record #$i has ${r.length}")
      }
      transport.putRecordBatch(streamName, records)
    }
  }

  /** The write policy whose batching keeps every call inside the
    * PutRecordBatch envelope. */
  def policy(maxRetries: Int = 5, backoffMs: Long = 10000L,
      sleep: Long => Unit = Thread.sleep): KinesisSink.Policy =
    KinesisSink.Policy(
      maxBatch = MaxRecordsPerCall,
      maxRetries = maxRetries,
      backoffMs = backoffMs,
      sleep = sleep,
      maxBatchBytes = MaxBytesPerCall)
}
