package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Third relational batch: TPC-H-style nested/derived-table analytics and
 * deterministic statistical aggregates.
 */
object Relational3 {

  /** Q18-style "large orders": orders whose line quantity total exceeds
    * a threshold, with customer context. Having-filter on a derived
    * aggregate, then joins — the agg shrinks the join input first. */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150.0)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("total_qty"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Q14-style promo revenue share: conditional revenue ratio over
    * lineitem ⋈ part. Numerator/denominator are decimal-exact; the final
    * division is one deterministic double op. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).cast("double")
          .as("promo_rev"),
        sum(rev).cast("double").as("total_rev"))
      .withColumn("promo_share", col("promo_rev") / col("total_rev"))
      .orderBy("l_returnflag")
  }

  /** Q15-style top supplier(s): suppliers achieving the maximum revenue
    * (scalar-subquery-on-max pattern). */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)"))
        .cast("double").as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("mx"))
    val s = Tables.supplier(spark, dir)
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("mx"))
      .join(broadcast(s), col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /**
   * Time-range self-join: pairs of events by the same user within 60
   * seconds of each other. The scalable plan buckets time (each event
   * equi-joins only its own and the adjacent minute bucket) so the
   * shuffle key is (user, bucket) — never an unbounded theta-join; the
   * range predicate is a residual filter. Oracle: the plain range
   * self-join, which is equivalent because a ≤60 s pair is always in
   * the same or adjacent bucket.
   */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), Tables.epochMs(col("ts")).as("ms"))
    val a = ev.withColumn("bucket", expr("ms div 60000"))
    // a successor within +60 s lives in the same or the next minute
    // bucket, so replicate each right event into (its bucket, bucket-1)
    // and equi-join on (user, bucket); the range check is residual
    val b = ev.withColumn("bucket",
      explode(array(expr("ms div 60000"), expr("ms div 60000 - 1"))))
    a.as("a").join(b.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          (col("b.ms") - col("a.ms")).between(0L, 60000L) &&
          (col("b.ms") > col("a.ms") ||
            (col("b.ms") === col("a.ms") && col("b.event_id") > col("a.event_id"))))
      .select(
        col("a.event_id").as("id_a"),
        col("b.event_id").as("id_b"),
        (col("b.ms") - col("a.ms")).as("gap_ms"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /**
   * Deterministic variance/stddev: explicit `(Σx² − (Σx)²/n)/(n−1)` over
   * DECIMAL-exact component sums, so the result is identical in any
   * engine and any aggregation order — unlike built-in `var_samp`,
   * whose streaming double accumulation is order-dependent.
   */
  def varianceStats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(x * x).cast("double").as("sum_x2"))
      .withColumn("variance",
        (col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / (col("n") - 1))
      .withColumn("stddev", sqrt(col("variance")))
      .select(col("l_returnflag"), col("n"), col("sum_x"), col("variance"), col("stddev"))
      .orderBy("l_returnflag")
  }
}
