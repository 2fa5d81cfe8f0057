package graft.llm

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Train-once / serve-many memoization for the learned index models
 * (the IVF coarse quantizer, the PQ codebooks). In deployment an ANN
 * index is built OFFLINE and served by every query that follows; the
 * audit family (q52/q157/q158–q162) mirrors that by reusing one
 * trained model per corpus instead of re-running Lloyd's per query —
 * without this, four PQ-family queries each re-trained the identical
 * codebooks (~4.7 s of redundant training jobs per query at sf0.1).
 *
 * Correctness is unaffected BY CONSTRUCTION: both fits are fully
 * deterministic (stride-sampled lowest-id init, 2^48-scaled decimal
 * centroid sums, lowest-tie argmin — see [[KMeans]]), so a cache hit
 * returns bit-identically what the fresh fit would. The oracles
 * replay training from scratch every time and still hash-match.
 *
 * Key discipline: models are cached ONLY for file-backed corpora —
 * every leaf of the analyzed plan must be a file relation — keyed by
 * (hyperparameters, the relations' root paths, the canonicalized
 * plan). Plans over in-memory test relations train fresh:
 * `LocalRelation`'s canonical form does not include its data, so two
 * different planted fixtures with one schema would collide.
 *
 * Memory: a model is ≤ ~16 KB of doubles; the map holds one entry per
 * (corpus, hyperparameter) pair per JVM — bounded by the query
 * surface, not the data.
 *
 * Eviction (recorded decision, round-9): entries live for the JVM —
 * there is deliberately NO LRU/weak-ref scheme. Rationale: (a) the
 * entry count is bounded by (corpus × hyperparameter) pairs, i.e. the
 * deployed query surface, not data volume; (b) evicting a pinned-index
 * DataFrame from the map would NOT free its checkpoint blocks (they
 * are freed when the session ends), so eviction would only cause
 * re-builds that allocate MORE session-lifetime blocks — strictly
 * worse. A long-lived multi-tenant session that cycles through many
 * corpora should call [[invalidate]] at corpus-retirement points; the
 * next build then re-pins fresh. Build cost is metered in
 * [[buildSeconds]] so serve-vs-build time is separable in benchmarks.
 */
object ModelCache {

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Wall-clock seconds spent inside cache-MISS builds, per tag prefix
    * (e.g. "ivf", "pq", "lsh-bands"). Serve-path hits add nothing.
    * Lets a benchmark report one-time artifact build cost alongside
    * the per-query serve cost instead of silently discounting it. */
  private val buildNanos = new ConcurrentHashMap[String, java.lang.Long]()

  private def timed[T](tag: String)(build: => T): T = {
    val t0 = System.nanoTime()
    try build finally {
      val dt = System.nanoTime() - t0
      buildNanos.merge(tag.takeWhile(_ != '|'), dt, (a, b) => a + b)
    }
  }

  /** Per-tag build seconds accumulated so far in this JVM. */
  def buildSeconds: Map[String, Double] = {
    val it = buildNanos.entrySet().iterator()
    val b = Map.newBuilder[String, Double]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue / 1e9 }
    b.result()
  }

  /** Drop every cached model/pin (tests; corpus retirement). */
  def invalidate(): Unit = cache.clear()

  /** Meter a build that manages its OWN storage (e.g. the bucketed
    * table land, which lives in the session catalog, not this map):
    * the cost accrues in [[buildSeconds]] under `tag`, but existence
    * checks stay with the caller — caching a value here while the
    * real artifact can be dropped independently (DROP TABLE) would
    * let the two diverge. */
  def meter[T](tag: String)(build: => T): T = timed(tag)(build)

  /** get-or-build WITHOUT holding the map's bin lock during the build:
    * builds nest (the lsh-pairs build calls the lsh-bands memo on this
    * same map), and a nested `computeIfAbsent` whose key collides with
    * the in-flight bin throws `IllegalStateException: Recursive
    * update`. Racing threads may build twice; both values are
    * bit-identical by construction (see class doc), `putIfAbsent`
    * keeps the first — and the loser's value, if it is a pinned
    * DataFrame, has already `localCheckpoint`'ed blocks that nothing
    * will ever read: release them immediately instead of leaking them
    * for the session lifetime (eviction can't free them later — class
    * doc). */
  private def getOrBuild(key: String, tag: String)(build: => AnyRef): AnyRef = {
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      val v = timed(tag)(build)
      val prev = cache.putIfAbsent(key, v)
      if (prev != null) { releasePin(v); prev } else v
    }
  }

  /** Best-effort release of a discarded pinned DataFrame's checkpoint
    * blocks: a pin's plan bottoms out in `LogicalRDD` leaves over the
    * checkpointed RDDs — unpersist them. The two racing builds never
    * share blocks (each checkpoints its own RDD), so this cannot
    * touch the winner's data. Non-DataFrame models (codebook arrays)
    * hold no executor state; nothing to free. */
  private def releasePin(v: AnyRef): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] =>
      ds.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
      }.foreach(_.unpersist(blocking = false))
    case _ => ()
  }

  def memo[T <: AnyRef](corpus: DataFrame, tag: String)(train: => T): T =
    corpusKey(corpus, tag) match {
      case None      => train
      case Some(key) => getOrBuild(key, tag)(train).asInstanceOf[T]
    }

  /**
   * [[memo]] for the STORED INDEX itself (a pinned DataFrame): one
   * encode + checkpoint per (session, corpus, geometry), reused by
   * every query serving that index — q159's audit reads the index
   * q158 built, exactly as a deployed recall probe would. The key
   * additionally carries the session (checkpointed blocks are
   * session-lifetime state) and the reliable-checkpoint flag (the two
   * pin modes differ in failure semantics, never in rows — but a
   * caller opting into durability must not receive an ephemeral pin).
   */
  def memoIndex(corpus: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    corpusKey(corpus, tag) match {
      case None => build
      case Some(key) =>
        val session = corpus.sparkSession
        val reliable = session.conf.get("graft.checkpoint.reliable", "false")
        val full = s"$key|session=${System.identityHashCode(session)}|reliable=$reliable"
        getOrBuild(full, tag)(build).asInstanceOf[DataFrame]
    }

  /** Cache key for a file-backed corpus plan; None (do not cache) if
    * any leaf is not a file relation. */
  private def corpusKey(corpus: DataFrame, tag: String): Option[String] = {
    val plan = corpus.queryExecution.analyzed
    val leaves = plan.collectLeaves()
    val fileBacked = leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
      case _ => false
    }
    if (!fileBacked) None
    else {
      val paths = plan.collect {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
          case other => other.toString
        }
      }.mkString(";")
      Some(s"$tag|$paths|${plan.canonicalized.toString}")
    }
  }
}
