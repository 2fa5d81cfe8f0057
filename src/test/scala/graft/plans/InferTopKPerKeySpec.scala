package graft.plans

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class InferTopKPerKeySpec extends SparkSpec {

  /** Isolated session with the rule + strategy installed. */
  private lazy val opt: SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(InferTopKPerKey)
    s.experimental.extraStrategies = Seq(new GraftStrategies)
    s
  }

  /** Guaranteed-vanilla baseline session: the SHARED suite session may
    * have the rule installed by any q100-running suite
    * (TopK.ensureOptimizations), which would turn the window baselines
    * below into the operator under test. */
  private lazy val vanilla: SparkSession = {
    val s = spark.newSession()
    assert(s.experimental.extraOptimizations.isEmpty)
    s
  }

  private def rnFiltered(s: SparkSession, k: Int,
      rankFn: org.apache.spark.sql.Column = row_number(),
      keepRank: Boolean = false, extraPred: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val ranked = Tables.lineitem(s, sf)
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", rankFn.over(w))
    val cond = extraPred.map(col("rn") <= k && _).getOrElse(col("rn") <= k)
    val filtered = ranked.filter(cond)
    if (keepRank) filtered else filtered.drop("rn")
  }

  private def sortAll(df: DataFrame) =
    df.orderBy(col("l_suppkey"), col("l_extendedprice").desc,
      col("l_orderkey"), col("l_linenumber"))

  test("discarded-rank row_number filter rewrites to TopKPerKeyNode") {
    val df = rnFiltered(opt, 3)
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collect { case n: TopKPerKeyNode => n }.nonEmpty,
      s"rule did not fire:\n$optimized")
    assert(optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
      s"window survived the rewrite:\n$optimized")
    // bit-identical to the unrewritten window formulation
    val want = sortAll(rnFiltered(vanilla, 3)).collect()
    val got = sortAll(df).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("residual conjuncts are re-applied above the operator") {
    val pred = col("l_extendedprice") > 50000.0
    val df = rnFiltered(opt, 3, extraPred = Some(pred))
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collect { case n: TopKPerKeyNode => n }.nonEmpty,
      s"rule did not fire:\n$optimized")
    val want = sortAll(rnFiltered(vanilla, 3, extraPred = Some(pred))).collect()
    val got = sortAll(df).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("a surviving rank column rewrites to a rank-emitting node") {
    val df = rnFiltered(opt, 3, keepRank = true)
    val optimized = df.queryExecution.optimizedPlan
    val nodes = optimized.collect { case n: TopKPerKeyNode => n }
    assert(nodes.nonEmpty, s"surviving-rank shape did not rewrite:\n$optimized")
    assert(nodes.head.rankAttr.isDefined, s"node does not emit the rank:\n$optimized")
    assert(optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
      s"window survived the rewrite:\n$optimized")
    // ranks bit-identical to the unrewritten window formulation
    val want = sortAll(rnFiltered(vanilla, 3, keepRank = true)).collect()
    val got = sortAll(df).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("rank-emitting perKeyWithRank matches the window formulation") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
    val got = sortAll(TopK.perKeyWithRank(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
        k = 3, rankCol = "rn")).collect()
    val want = sortAll(rnFiltered(vanilla, 3, keepRank = true)
      .withColumn("rn", col("rn").cast("long"))).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("q100's window formulation plans as the custom operator") {
    val df = TopK.customerTopOrders(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collect { case n: TopKPerKeyNode => n }.nonEmpty,
      s"q100 not rewritten:\n$optimized")
  }

  test("rank() (ties keep >k rows) vetoes the rewrite") {
    val df = rnFiltered(opt, 3, rankFn = rank())
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collect { case n: TopKPerKeyNode => n }.isEmpty,
      s"rank() must not rewrite:\n$optimized")
  }
}
