package graft

import org.apache.spark.sql.SparkSession

/**
 * CONCURRENT-SERVE audit (round-16 directive #4): the bench is
 * sequential, but a real warehouse serves many queries at once —
 * driver-side contention, scheduler stalls, and shared-memo races
 * don't show up one-at-a-time. Four phases, one fair-scheduler pool
 * per query:
 *
 *  1. COLD ISOLATED — each shared artifact built exactly once,
 *     sequentially; per-tag build seconds snapshot = the single-build
 *     baseline.
 *  2. WARM ISOLATED — min-of-2 serve time per query with memos warm:
 *     the per-query cost yardstick.
 *  3. COLD STORM — memos invalidated, the four KN memo-SHARERS
 *     (q260/q267 on `doc-scores`, q266/q269 on `para-scores`, all
 *     four on `bigram-lm`) launched together. Gate: per-tag build
 *     COUNT ≤ the phase-1 single-build count — the single-flight
 *     proof (the memo layer's first concurrency test). Counts, not
 *     seconds: a single build's wall time legitimately inflates under
 *     CPU contention (measured: para-scores 1.5 s alone, 2.8 s inside
 *     the storm, still ONE invocation); a duplicated build is a count
 *     of two.
 *  4. WARM STORM — all eight queries at once. Gates:
 *     (a) concurrent wall ≤ 0.9× the warm sequential sum (parallel
 *         serving must actually help — lock serialization fails this);
 *     (b) no query exceeds max(2× isolated, isolated + 0.8× wall).
 *         The first arm is the plain no-starvation bound; the second
 *         is the fair-share allowance: the panel's HEAVIEST query
 *         finishes at the wall by construction (measured: q213 at
 *         3.1× its isolated time while the global speedup held 1.5×),
 *         and any query may legitimately wait out most of the wall
 *         while 32 cores serve eight pools — but exceeding its own
 *         cost plus a wall-share means the scheduler or a lock
 *         starved it specifically.
 *
 * Exit 0 = all gates hold; exit 1 = violation, named in the JSON.
 * Wired into tools/closing_gate.sh at sf0.1.
 *
 * Usage: runMain graft.ConcurrentServe  (env: SPARK_GRAFT_SF_DIR,
 * SPARK_GRAFT_CPUS)
 */
object ConcurrentServe {

  /** The KN memo-sharing subpanel (cold storm). */
  private val Sharers = Seq(
    "q260_kn_doc_score", "q267_perplexity_buckets",
    "q266_paragraph_lm_trim", "q269_trim_aware_mix")

  /** Mid-weight panel: the sharers + 4 independents across the
    * dedup/quality/window families. */
  private val Panel = Sharers ++ Seq(
    "q213_dup_span_trim", "q155_winnow_dedup",
    "q135_mad_outliers", "q112_funnel")

  /** Shared artifact tags whose build must be paid once per storm. */
  private val SharedTags = Seq("bigram-lm", "para-scores", "doc-scores")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-conc-wh").toString)
      .config("spark.cleaner.periodicGC.interval", "24h")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    def buildSnapshot(): Map[String, Int] =
      graft.llm.ModelCache.buildCounts.filter {
        case (t, _) => SharedTags.contains(t) }

    def buildDelta(before: Map[String, Int]): Map[String, Int] =
      buildSnapshot().map { case (t, v) =>
        t -> (v - before.getOrElse(t, 0)) }.filter(_._2 > 0)

    // untimed JIT/codegen warmup at the smallest fixture
    Panel.foreach(n =>
      try run(n, "/root/testdata/sf0.001") catch { case _: Throwable => () })
    spark.catalog.clearCache()

    // phase 1 — cold isolated: single-build baseline per shared tag
    graft.llm.ModelCache.invalidate()
    val b0 = buildSnapshot()
    Sharers.foreach(run(_, sfDir))
    spark.catalog.clearCache()
    val singleBuild = buildDelta(b0)

    // phase 2 — warm isolated: min of 2 reps each, memos stay warm
    val isolated: Map[String, Double] = Panel.map { n =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        run(n, sfDir)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      System.gc(); Thread.sleep(50)
      n -> ts.min
    }.toMap
    val sequentialSum = isolated.values.sum

    def storm(names: Seq[String]): (Map[String, Double], Map[String, String], Double) = {
      val times = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = names.map { n =>
        new Thread(() => {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", n)
          start.await()
          val t0 = System.nanoTime()
          try {
            run(n, sfDir)
            times.put(n, (System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable => errors.put(n,
              Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
          }
        }, s"serve-$n")
      }
      threads.foreach(_.start())
      val w0 = System.nanoTime()
      start.countDown()
      threads.foreach(_.join(600000))
      val wall = (System.nanoTime() - w0) / 1e9
      import scala.jdk.CollectionConverters._
      (times.asScala.toMap, errors.asScala.toMap, wall)
    }

    // phase 3 — cold storm over the sharers: single-flight proof
    spark.catalog.clearCache()
    graft.llm.ModelCache.invalidate()
    System.gc(); Thread.sleep(100)
    val b1 = buildSnapshot()
    val (coldTimes, coldErrs, coldWall) = storm(Sharers)
    val stormBuild = buildDelta(b1)
    spark.catalog.clearCache()

    // phase 4 — warm storm over the full panel. The sharers' memos are
    // warm from phase 3, but phase 3's GLOBAL invalidate also colded
    // the independents' own memos (q155's winnow-fps, q213's
    // dup-grams) — re-warm them UNTIMED here, or their one-time builds
    // land inside the warm-storm gates while their phase-2 baselines
    // exclude builds (review finding, round 17)
    Panel.filterNot(Sharers.contains).foreach(run(_, sfDir))
    spark.catalog.clearCache()
    System.gc(); Thread.sleep(100)
    val (conc, warmErrs, wall) = storm(Panel)

    val violations = Seq.newBuilder[String]
    if (coldErrs.nonEmpty) violations += s"cold-storm errors=$coldErrs"
    if (warmErrs.nonEmpty) violations += s"warm-storm errors=$warmErrs"
    if (conc.size != Panel.size)
      violations += s"only ${conc.size}/${Panel.size} finished"
    // the cold storm needs the same completeness gate: a sharer that
    // outlives the join timeout records neither a time nor an error,
    // and would silently keep running into the re-warm + warm storm
    if (coldTimes.size + coldErrs.size != Sharers.size)
      violations += s"cold storm: only ${coldTimes.size}/${Sharers.size}" +
        " finished (straggler past the join timeout)"
    SharedTags.foreach { t =>
      val base = singleBuild.getOrElse(t, 0)
      val got = stormBuild.getOrElse(t, 0)
      if (base > 0 && got > base)
        violations += s"tag $t built $got times under the cold storm vs " +
          s"$base single-build — single-flight failed (duplicated build)"
      if (base > 0 && got == 0)
        violations += s"tag $t never rebuilt under the cold storm — " +
          "the invalidate() did not take; the storm measured nothing"
    }
    if (wall > 0.9 * sequentialSum)
      violations += f"wall $wall%.2f s vs sequential sum $sequentialSum%.2f s" +
        " — concurrency is not helping (serialization)"
    val starved = Panel.filter { n =>
      conc.get(n).exists(c =>
        c > math.max(2.0 * isolated(n), isolated(n) + 0.8 * wall))
    }
    if (starved.nonEmpty)
      violations += "starved beyond the fair-share envelope: " + starved.map(
        n => f"$n ${conc(n)}%.2f s (iso ${isolated(n)}%.2f, wall $wall%.2f)")
        .mkString(", ")

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    def jint(m: Seq[(String, Int)]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val bad = violations.result()
    println(s"""{"isolated":${jmap(isolated.toSeq.sortBy(_._1))},""" +
      s""""concurrent":${jmap(conc.toSeq.sortBy(_._1))},""" +
      s""""cold_storm":${jmap(coldTimes.toSeq.sortBy(_._1))},""" +
      s""""cold_storm_wall":${fmt(coldWall)},""" +
      s""""single_build_counts":${jint(singleBuild.toSeq.sortBy(_._1))},""" +
      s""""storm_build_counts":${jint(stormBuild.toSeq.sortBy(_._1))},""" +
      s""""sequential_sum":${fmt(sequentialSum)},"concurrent_wall":${fmt(wall)},""" +
      s""""speedup":${fmt(sequentialSum / math.max(wall, 1e-9))},""" +
      s""""violations":${bad.map(v => "\"" + v.replace("\"", "'") + "\"")
        .mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
