package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/**
 * The 100 TB co-location story, demonstrated at fixture scale: bucketed
 * tables joined on the bucket key must plan with NO shuffle exchange —
 * the layout investment that turns every recurring fact-fact join from
 * a full-network shuffle into a local zip of buckets.
 */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val li = spark.table("li_bucketed")
    val od = spark.table("ord_bucketed")
    // disable broadcast so the join must pick a partitioned strategy
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = li.join(od, li("l_orderkey") === od("o_orderkey"))
        .groupBy(od("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan feeds the join directly: no Exchange below the join
      val joinPart = plan.split("HashAggregate").last
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a partitioned join:\n$plan")
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucket scan not used:\n$plan")
      // and it computes the right thing
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority").collect()
      assert(joined.orderBy("o_orderpriority").collect().sameElements(expected))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
