package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom stateful streaming operators
 * (`flatMapGroupsWithState` — the Spark-native form of "keep per-key
 * state across micro-batches", which the reference could not express at
 * all: its only state was one in-memory timestamp, SURVEY.md §2.3 W2).
 */
object StatefulOps {

  final case class SessionInput(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(
      sessionStartMs: Long, lastMs: Long, nEvents: Long)
  final case class SessionOutput(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /**
   * Streaming sessionization: per-user sessions close after a 30-minute
   * event-time gap (mirrors the batch `Relational2.sessionize`, but
   * emits sessions incrementally). Event-time timeouts: a session
   * closes when the watermark passes its last event + gap — determinate
   * replay, no wall-clock dependence.
   */
  def sessionize(events: Dataset[SessionInput],
      watermarkDelay: String = "10 seconds"): Dataset[SessionOutput] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOutput(userId, s.sessionStartMs, s.lastMs, s.nEvents))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOutput]
            var cur = state.getOption
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.lastMs <= GapMs =>
                  cur = Some(s.copy(lastMs = ms, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionOutput(userId, s.sessionStartMs, s.lastMs, s.nEvents)
                  cur = Some(SessionState(ms, ms, 1))
                case None =>
                  cur = Some(SessionState(ms, ms, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /**
   * Stream-stream interval join: purchases matched to the same user's
   * signup within the following hour (conversion funnel). Both sides
   * carry watermarks AND the join carries a two-sided time-range
   * predicate — together they bound exactly how long each side's rows
   * sit in the state store, which is the difference between bounded
   * and unbounded state at 100 TB/day stream volume.
   *
   * `joinType = "left_outer"` additionally emits every signup that
   * never converted, null-padded, once the watermark passes its join
   * window — and that SAME watermark pass is what lets the store evict
   * the signup's state row (asserted via `stateOperators` progress in
   * the spec). The reference polled one endpoint at a time and could
   * express neither the correlation nor the timeout (SURVEY.md §2.3 W3).
   */
  def conversionFunnel(signups: DataFrame, purchases: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val s = signups
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_event"))
      .withWatermark("s_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"), col("value"))
      .withWatermark("p_ts", "1 hour")
    s.join(p,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), joinType)
      .select(col("s_user").as("user_id"), col("s_event"), col("p_event"),
        col("s_ts"), col("p_ts"), col("value"))
  }

  final case class BucketInput(band: Int, sig: String, doc_id: Long, ts: Timestamp)
  final case class BucketState(docIds: List[Long])
  final case class CandidatePair(band: Int, sig: String, id_a: Long, id_b: Long)

  /** Per-bucket resident cap and idle TTL for [[streamingLshCandidates]]. */
  val BucketCap: Int = 8
  val BucketTtlMs: Long = 60 * 60 * 1000L

  /**
   * Incremental (streaming) MinHash-LSH near-dup candidates: documents
   * arrive as a stream, each is banded with the SAME row-local
   * shingle → salted-md5-minhash → 4×2 banding as the batch
   * [[graft.llm.Dedup.minhashLsh]] (the signatures are computed inside
   * one projection — `array_min` over the doc's own shingle array —
   * so banding needs NO streaming aggregation, leaving the one
   * stateful operator budget to the bucket store), and every (band,
   * signature) bucket remembers the doc_ids it has seen; a new
   * arrival emits a candidate pair against each remembered resident.
   * Downstream consumers verify exact Jaccard on the candidate sliver,
   * exactly like the batch pipeline (and like batch q101's
   * corpus-vs-batch band join, but without re-reading the corpus).
   *
   * The two disciplines that keep state BOUNDED at 100 TB/day:
   *  - hot-bucket cap: a bucket stores at most [[BucketCap]]
   *    residents — a boilerplate signature shared by millions of docs
   *    emits ≤ cap pairs per arrival and holds ≤ cap ids, instead of
   *    the quadratic blowup (the streaming twin of the batch
   *    `Dedup.BucketCap` guard);
   *  - idle TTL: event-time timeout drops buckets untouched for
   *    [[BucketTtlMs]] past the watermark — the state store holds the
   *    recent-signature working set, not every signature ever seen.
   *
   * Emission contract: AT-LEAST-ONCE per candidate pair. A document
   * that arrives while its bucket is at cap is never recorded, so a
   * re-arrival of the same doc_id in a later batch re-emits its pairs
   * against the residents. Downstream consumers already verify exact
   * Jaccard on the candidate sliver (a natural dedup point), exactly
   * as the batch pipeline treats candidates as a multiset.
   */
  def streamingLshCandidates(docs: DataFrame,
      watermarkDelay: String = "10 seconds",
      cap: Int = BucketCap, ttlMs: Long = BucketTtlMs): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val bandCols = (0 until graft.llm.Dedup.NumBands).map(b =>
      concat_ws(",", col(s"h${2 * b}"), col(s"h${2 * b + 1}")))
    graft.llm.Dedup.withMinhashes(graft.llm.Dedup.withShingleArray(docs))
      .select(col("doc_id"), col("ts"),
        posexplode(array(bandCols: _*)).as(Seq("band", "sig")))
      .withWatermark("ts", watermarkDelay)
      .as[BucketInput]
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, sig), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // doc_id order inside the batch: deterministic pair emission
            val sorted = rows.toSeq.sortBy(_.doc_id)
            var residents = state.getOption.map(_.docIds).getOrElse(Nil)
            var maxMs = 0L
            val out = List.newBuilder[CandidatePair]
            sorted.foreach { r =>
              maxMs = math.max(maxMs, r.ts.getTime)
              if (!residents.contains(r.doc_id)) {
                residents.foreach { s =>
                  out += CandidatePair(band, sig,
                    math.min(s, r.doc_id), math.max(s, r.doc_id))
                }
                if (residents.size < cap) residents = residents :+ r.doc_id
              }
            }
            state.update(BucketState(residents))
            // clamp the timeout strictly past the current watermark: a
            // late-but-admitted row with ttlMs below the watermark delay
            // would otherwise set a timeout ≤ watermark, which Spark
            // rejects at runtime (IllegalArgumentException)
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(maxMs + ttlMs, wm + 1))
            out.result().iterator
          }
      }
  }

  final case class AsOfVersion(tsMs: Long, attr: String)
  final case class AsOfPending(event_id: Long, tsMs: Long)
  final case class AsOfState(versions: List[AsOfVersion], pending: List[AsOfPending])
  final case class AsOfOutput(
      user_id: Long, event_id: Long, event_ts_ms: Long,
      attr: Option[String], version_ts_ms: Option[Long])

  /** Idle TTL for [[streamingAsOfJoin]] dimension state: a key whose
    * newest version is this far behind the watermark, with no pending
    * events, is dropped entirely. */
  val AsOfIdleTtlMs: Long = 60 * 60 * 1000L

  /**
   * Streaming stream-stream AS-OF join — the streaming twin of the
   * batch SCD2 point-in-interval lookup (`Relational4.pointInInterval`,
   * q128): a stream of dimension updates `(user_id, ts, attr)` versions
   * each key over time, and every event `(user_id, ts, event_id)` is
   * enriched with the version valid AT its timestamp (the latest update
   * with `upd_ts ≤ event_ts`; none → null-padded, left-outer style).
   *
   * Spark's built-in stream-stream joins can't express "latest row at
   * or before" (an inequality against an ORDER-dependent winner, not a
   * range intersection), so this is the `flatMapGroupsWithState` tier:
   * both streams are tagged and unioned (one stateful operator, one
   * shuffle on user_id), and per-key state co-processes them.
   *
   * Correctness under out-of-order arrival: an event is matched only
   * once the watermark passes its timestamp — from then on any update
   * that could still affect it (`upd_ts ≤ event_ts ≤ watermark`) would
   * be rejected as too late, so the emitted match is FINAL (exactly
   * once per event, deterministic under replay).
   *
   * Bounded state at stream scale:
   *  - events buffer only until the watermark passes them (watermark
   *    delay worth of events per key, same bound as any stream-stream
   *    join);
   *  - superseded versions are dropped as the watermark advances — only
   *    the newest version at-or-below the watermark (the as-of answer
   *    for all future events) plus any not-yet-final newer versions
   *    are retained (versions-per-key never grows with stream length);
   *  - idle keys (no pending events, newest version > [[AsOfIdleTtlMs]]
   *    behind the watermark) are REMOVED — eviction asserted via
   *    `stateOperators.numRowsRemoved` in `StatefulOpsSpec`.
   */
  def streamingAsOfJoin(updates: DataFrame, events: DataFrame,
      watermarkDelay: String = "10 seconds",
      idleTtlMs: Long = AsOfIdleTtlMs): Dataset[AsOfOutput] = {
    import updates.sparkSession.implicits._
    val u = updates.select(col("user_id").cast("long").as("user_id"), col("ts"),
      lit("U").as("kind"), lit(-1L).as("event_id"), col("attr").cast("string"))
    val e = events.select(col("user_id").cast("long").as("user_id"), col("ts"),
      lit("E").as("kind"), col("event_id").cast("long"),
      lit(null).cast("string").as("attr"))
    u.unionByName(e)
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, String, Long, Option[String])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfState, AsOfOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(AsOfState(Nil, Nil))
          if (!state.hasTimedOut) {
            // ingest order is irrelevant to matching (flush consults the
            // whole version list), but keep lists ts-sorted for the
            // deterministic supersession trim below
            rows.foreach { r =>
              if (r._3 == "U")
                st = st.copy(versions =
                  (st.versions :+ AsOfVersion(r._2.getTime, r._5.orNull))
                    .sortBy(_.tsMs))
              else
                st = st.copy(pending = st.pending :+ AsOfPending(r._4, r._2.getTime))
            }
          }
          // events finalized by the watermark: match and emit
          val (ready, waiting) = st.pending.partition(_.tsMs <= wm)
          val out = ready.sortBy(p => (p.tsMs, p.event_id)).map { p =>
            val v = st.versions.takeWhile(_.tsMs <= p.tsMs).lastOption
            AsOfOutput(userId, p.event_id, p.tsMs, v.map(_.attr), v.map(_.tsMs))
          }
          // supersession trim: of the versions at-or-below the watermark
          // only the newest can ever be an as-of answer again
          val (past, future) = st.versions.partition(_.tsMs <= wm)
          val kept = past.lastOption.toList ++ future
          if (waiting.isEmpty && kept.forall(_.tsMs + idleTtlMs <= wm)) {
            state.remove()
          } else {
            state.update(AsOfState(kept, waiting))
            val next =
              if (waiting.nonEmpty) waiting.map(_.tsMs).min
              else kept.map(_.tsMs + idleTtlMs).max
            // strictly past the current watermark or Spark rejects it
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.iterator
      }
  }

  final case class ZPending(event_id: Long, tsMs: Long, value: Double)
  final case class ZState(ring: List[Double], pending: List[ZPending])
  final case class ZOutput(
      event_type: String, event_id: Long, ts_ms: Long, value: Double, z: Double)

  /**
   * Streaming trailing z-score anomaly detection — the streaming twin
   * of the batch `Relational4.windowZScore` (q107): each event is
   * scored against the previous ≤ `frame` events of its type and
   * emitted when |z| exceeds `threshold`.
   *
   * Deterministic under out-of-order arrival, the
   * [[streamingAsOfJoin]] discipline: an event is scored only once the
   * watermark passes its timestamp — every event that belongs before
   * it in (ts, event_id) order has either arrived or would be rejected
   * as too late — so the trailing window it sees is FINAL and identical
   * under any replay/arrival interleaving (asserted by the shuffled-
   * arrival spec). Scoring folds the ring left-to-right in its event
   * order, so even the double arithmetic is replay-stable.
   *
   * Bounded state: ≤ `frame` doubles per event type (a bounded
   * categorical domain) plus the pending buffer, which normally holds
   * at most a watermark-delay's worth of events per key — the same
   * bound as any stream-stream join — and is HARD-capped at
   * `maxPending` against the pathological case the delay bound can't
   * cover: one key flooding while the watermark stalls (an idle
   * upstream partition holds the global watermark still no matter how
   * much data arrives on this key). When the cap binds, the events
   * kept are the `maxPending` earliest in (ts, event_id) order — the
   * ones the watermark will finalize first — and the overflow is
   * load-shed, mirroring the streaming-LSH hot-bucket cap: bounded
   * state is the contract, and the shed set is a deterministic
   * function of what arrived, never of arrival order. No TTL needed:
   * the ring IS the key's value.
   */
  def streamingAnomalies(events: DataFrame,
      watermarkDelay: String = "10 seconds",
      frame: Int = 100, minN: Int = 30,
      threshold: Double = 2.5,
      maxPending: Int = 100000): Dataset[ZOutput] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").cast("string").as("event_type"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Long, Double, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ZState, ZOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (etype, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(ZState(Nil, Nil))
          // batch rows land in a growable buffer and join the carried
          // pending list with ONE O(old + new) concat — the previous
          // per-row `List :+` was O(n) per append, O(n²) across a hot
          // batch
          val fresh = scala.collection.mutable.ArrayBuffer.empty[ZPending]
          if (!state.hasTimedOut) {
            rows.foreach(r => fresh += ZPending(r._2, r._4.getTime, r._3))
          }
          val all = st.pending ++ fresh
          val bounded =
            if (all.lengthCompare(maxPending) <= 0) all
            else all.sortBy(p => (p.tsMs, p.event_id)).take(maxPending)
          val (ready, waiting) = bounded.partition(_.tsMs <= wm)
          var ring = st.ring
          val out = List.newBuilder[ZOutput]
          ready.sortBy(p => (p.tsMs, p.event_id)).foreach { p =>
            val n = ring.size
            if (n >= minN) {
              val s1 = ring.foldLeft(0.0)(_ + _)
              val s2 = ring.foldLeft(0.0)((a, v) => a + v * v)
              val mean = s1 / n
              val variance = (s2 - s1 * s1 / n) / (n - 1)
              if (variance > 0.0) {
                val z = (p.value - mean) / math.sqrt(variance)
                if (math.abs(z) > threshold)
                  out += ZOutput(etype, p.event_id, p.tsMs, p.value, z)
              }
            }
            ring = (ring :+ p.value).takeRight(frame)
          }
          if (waiting.isEmpty && ring.isEmpty) state.remove()
          else {
            state.update(ZState(ring, waiting))
            if (waiting.nonEmpty) {
              // wake when the watermark can next finalize something;
              // strictly past the current watermark or Spark rejects it
              state.setTimeoutTimestamp(math.max(waiting.map(_.tsMs).min, wm + 1))
            } // no pending: the ring just waits for the key's next rows
          }
          out.result().iterator
      }
  }

  /**
   * Stream-static join: enrich the event stream with the customer
   * dimension. The static side is a plain DataFrame — Spark broadcasts
   * it into every micro-batch (no state store, no watermark needed).
   */
  def enrichWithCustomers(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("c_name"), col("c_mktsegment"))
}
