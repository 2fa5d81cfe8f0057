package graft.llm

import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cache-lifecycle disciplines ModelCache documents:
  * train-once/serve-many, the [[ModelCache.invalidate]]
  * corpus-retirement path (multi-tenant sessions cycle corpora and
  * must actually release + rebuild), and the double-build race's
  * loser releasing its orphaned checkpoint blocks. */
class ModelCacheSpec extends SparkSpec {

  private def corpus = graft.model.Tables.documents(spark, sf)

  test("memoIndex: second call serves the cached pin; invalidate() rebuilds fresh") {
    ModelCache.invalidate()
    val builds = new AtomicInteger(0)
    def serve() = ModelCache.memoIndex(corpus, "spec-invalidate") {
      builds.incrementAndGet()
      graft.ops.GlobalOrder.pin(
        corpus.groupBy(col("source")).agg(count(lit(1)).as("n")))
    }
    val first = serve()
    assert(builds.get() == 1)
    val second = serve()
    assert(builds.get() == 1, "cache hit must not rebuild")
    assert(second eq first, "hit must return the SAME pinned frame")
    ModelCache.invalidate()
    val third = serve()
    assert(builds.get() == 2, "invalidate() must force a rebuild")
    assert(!(third eq first), "post-invalidate build must be a fresh pin")
    assert(third.collect().toSet == first.collect().toSet,
      "rebuild is bit-identical by construction")
    ModelCache.invalidate()
  }

  test("double-build race: the losing build's checkpoint blocks are released") {
    ModelCache.invalidate()
    val sc = spark.sparkContext
    // settle any async unpersists from other suites before baselining
    val before = sc.getPersistentRDDs.size
    val barrier = new CyclicBarrier(2)
    def serve() = ModelCache.memoIndex(corpus, "spec-race") {
      // both threads reach the build body before either publishes:
      // guarantees the putIfAbsent race actually happens
      barrier.await()
      graft.ops.GlobalOrder.pin(
        corpus.groupBy(col("lang")).agg(count(lit(1)).as("n")))
    }
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val threads = Seq.fill(2)(new Thread(() => results.add(serve())))
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(results.size == 2)
    val rs = results.toArray
    assert(rs(0) eq rs(1), "both racers must converge on one cached value")
    // two pins were checkpointed; the loser's must be unpersisted
    // (async — poll). Exactly ONE new persistent RDD may remain.
    val deadline = System.nanoTime() + 10e9.toLong
    var extra = sc.getPersistentRDDs.size - before
    while (extra > 1 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      extra = sc.getPersistentRDDs.size - before
    }
    assert(extra <= 1,
      s"race loser leaked checkpoint blocks: $extra new persistent RDDs remain")
    ModelCache.invalidate()
  }
}
