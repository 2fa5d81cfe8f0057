package graft.plans

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  // the window baseline runs on a guaranteed-vanilla session: other
  // suites install InferTopKPerKey into the shared session (q100 via
  // ensureOptimizations), which would silently rewrite this exact
  // discarded-rank shape into the operator under test — the parity
  // check must compare against the REAL window plan
  private lazy val vanilla = {
    val s = spark.newSession()
    assert(s.experimental.extraOptimizations.isEmpty)
    s
  }

  private def windowFormulation(k: Int) = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(vanilla, sf)
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  test("custom operator matches the window row_number formulation") {
    val custom = TopK.supplierTopLineitems(spark, sf).collect()
    val window = windowFormulation(3).collect()
    assert(custom.length == window.length)
    assert(custom.sameElements(window))
  }

  test("physical plan uses partial+final TopKPerKeyExec with one exchange between") {
    val df = TopK.supplierTopLineitems(spark, sf)
    df.collect() // finalize the adaptive plan (inserts the exchanges)
    // AQE query-stage wrappers are childless TreeNodes, so a collect()
    // can't traverse into them — assert on the rendered final plan: the
    // final (partial=false) node, above a key-clustered exchange, above
    // the partial (partial=true) node
    val rendered = df.queryExecution.executedPlan.toString
    val idxFinal = rendered.indexOf("TopKPerKey [l_suppkey")
    val idxExchange = rendered.indexOf("Exchange hashpartitioning(l_suppkey", idxFinal)
    val idxPartial = rendered.indexOf("3, true", idxExchange)
    assert(rendered.contains("3, false"), s"no final TopKPerKey node in:\n$rendered")
    assert(idxFinal >= 0 && idxExchange > idxFinal && idxPartial > idxExchange,
      s"expected final TopKPerKey above a hash exchange above the partial, got:\n$rendered")
  }

  test("result is invariant to input partitioning") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
    def run(parts: Int) =
      TopK.perKey(li.repartition(parts), Seq("l_suppkey"),
          Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 3)
        .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))
        .collect()
    assert(run(1).sameElements(run(7)))
  }

  test("k larger than any group returns every row") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
    val all = TopK.perKey(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
        k = 10000000)
    assert(all.count() == li.count())
  }

  test("strategy is injectable through SparkSessionExtensions") {
    // the extension object wires the same strategy the lazy path adds;
    // applying it to a fresh SparkSessionExtensions must register a
    // planner strategy without touching the live session
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftShims.plannerStrategies(ext, spark)
    assert(strategies.exists(_.isInstanceOf[GraftStrategies]))
  }
}
