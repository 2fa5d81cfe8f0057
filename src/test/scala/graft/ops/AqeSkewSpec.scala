package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * AQE skew audit (round-7 verdict #7): which skew shapes does Spark 4
 * AQE handle natively, and which still need the manual salt?
 *
 * Decision rule proven here and documented in SCALE.md:
 *  - shuffled EQUI-JOINS with hot keys → AQE's OptimizeSkewedJoin
 *    splits the oversized partition at runtime (`skew=true` in the
 *    final plan); the manual salt (q87 `saltedJoin`) is only needed
 *    when AQE is off or the join must keep a specific partitioning;
 *  - hot-key AGGREGATES → AQE has NO skewed-aggregate rewrite (it can
 *    only coalesce small partitions, never split a big one, because a
 *    final hash aggregate requires all rows of a key in one task);
 *    the salted two-phase aggregate (q49 `saltedAgg`) remains the
 *    mitigation.
 */
class AqeSkewSpec extends SparkSpec {

  // ~90% of fact rows land on key 0; dim is 50 keys — a classic hot
  // customer. Deterministic (id residues, no RNG).
  private def fact = spark.range(0, 120000L)
    .select(
      when(pmod(col("id"), lit(10L)) =!= 0L, lit(0L))
        .otherwise(pmod(col("id"), lit(50L))).as("k"),
      col("id").as("v"))
  private def dim = spark.range(0, 50L)
    .select(col("id").as("k"),
      concat(lit("seg-"), pmod(col("id"), lit(5L))).as("seg"))

  private def withSkewConf[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // scale the 256MB default thresholds down to the spec's data size
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan.toString
  }

  test("hot-key shuffled join: AQE splits the skewed partition at runtime") {
    withSkewConf {
      val joined = fact.join(dim, "k")
        .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-join did not fire on a 90%-hot key:\n$plan")
      // and the runtime split is pure plumbing: results match the
      // manually salted formulation of the same join bit for bit
      val salted = {
        val f = fact.withColumn("salt", pmod(col("v"), lit(8L)))
        val d = dim.withColumn("salt", explode(expr("sequence(0L, 7L)")))
        f.join(d, Seq("k", "salt"))
          .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      }
      assert(joined.orderBy("seg").collect().toSeq ==
        salted.orderBy("seg").collect().toSeq)
    }
  }

  test("hot-key aggregate: AQE cannot split it — the manual salt remains the fix") {
    withSkewConf {
      // same hot distribution, aggregate shape: one partition carries
      // ~90% of the rows and AQE has no rewrite that splits it (the
      // final aggregate needs every row of the key in one task)
      val agg = fact.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val plan = finalPlan(agg)
      assert(!plan.contains("skew=true"),
        s"no skewed-aggregate rewrite exists in Spark; plan claims one:\n$plan")
      // the two-phase salted aggregate produces identical results
      // while spreading key 0 over 8 reducers in phase 1 — q49's shape
      val salted = fact
        .withColumn("salt", pmod(col("v"), lit(8L)))
        .groupBy("k", "salt").agg(count(lit(1)).as("n1"), sum("v").as("s1"))
        .groupBy("k").agg(sum("n1").as("n"), sum("s1").as("sv"))
      assert(agg.orderBy("k").collect().toSeq ==
        salted.orderBy("k").collect().toSeq)
    }
  }
}
