package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's pure accounting helpers: the min-confirmation noise
  * metric that drives adaptive re-reps, and the warmup/timed build
  * ledger with its tag-attribution guard. */
class BenchSpec extends AnyFunSuite {

  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("minConfirm: reproduced min is quiet, unconfirmed min is loud") {
    // two reps agree on the floor — a 10x outlier doesn't matter
    assert(close(Bench.minConfirm(Seq(1.0, 10.0, 1.1)), 1.1))
    // min never reproduced: ratio is the gap to the next-best rep
    assert(close(Bench.minConfirm(Seq(1.0, 3.0, 5.0)), 3.0))
    assert(close(Bench.minConfirm(Seq(2.0, 2.0)), 1.0))
    // a single rep can't confirm itself but must not force re-reps
    assert(close(Bench.minConfirm(Seq(1.5)), 1.0))
    assert(Bench.minConfirm(Nil).isNaN)
    assert(Bench.minConfirm(Seq(0.0, 1.0)).isNaN)
  }

  test("buildLedger nets out warmup cost and flags warmup-only tags") {
    val warmup = Map("pq" -> 2.0, "lsh" -> 1.0, "tiny" -> 0.0005)
    val all = Map("pq" -> 5.5, "lsh" -> 1.0, "ivf" -> 0.8, "tiny" -> 0.0005)
    val (ledger, warmupOnly) = Bench.buildLedger(warmup, all)
    // timed-phase cost only, sorted descending
    assert(ledger == Seq("pq" -> 3.5, "ivf" -> 0.8))
    // lsh accrued real warmup cost but never rebuilt in the timed
    // phase — the misattribution the guard exists to surface; the
    // sub-millisecond tag is noise, not a finding
    assert(warmupOnly == Seq("lsh"))
  }

  test("buildLedger: matching tag sets produce an empty guard list") {
    val w = Map("a" -> 1.0)
    val (ledger, warmupOnly) = Bench.buildLedger(w, Map("a" -> 2.0))
    assert(ledger == Seq("a" -> 1.0) && warmupOnly.isEmpty)
  }
}
