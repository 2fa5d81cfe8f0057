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

  test("non-oracled queries are the known non-SQL-expressible set") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "q53_approx_sketches")  // HLL/approx-percentile are engine-specific
    assert(unoracled == expected,
      s"unexpected unoracled queries: ${unoracled -- expected}; missing: ${expected -- unoracled}")
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
