package graft

/**
 * Driver-contract guards: a typo'd key or missing oracle must fail CI,
 * not silently drop a correctness check at judging time.
 */
class ContractSpec extends SparkSpec {

  test("flagship entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key corresponds to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (no rows-only fallbacks)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"unoracled queries: $unoracled")
  }

  test("embedding fixture invariant: v * 2^48 is an exact integer everywhere") {
    // the bit-exact q61/q63 oracles rest on every float component
    // carrying <=48 fractional bits (so the scaled decimal sums are
    // exact in BOTH engines); a regenerated fixture that breaks this
    // must fail loudly here, not as a confusing hash mismatch
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory).foreach { d =>
        val scaled = col("v").cast("double") * lit(graft.llm.KMeans.Scale)
        val bad = graft.model.Tables.embeddings(spark, d)
          .select(explode(col("embedding")).as("v"))
          .filter(scaled =!= floor(scaled)).count()
        assert(bad == 0, s"$d: $bad embedding elements break the 2^48 invariant")
      }
  }

  test("every query runs and produces a non-degenerate schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
  }
}
