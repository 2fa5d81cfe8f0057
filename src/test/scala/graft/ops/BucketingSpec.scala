package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

class BucketingSpec extends SparkSpec with BeforeAndAfterAll {

  // the session catalog is shared across suites: drop the managed
  // tables so later suites never see this one's leftovers
  override def afterAll(): Unit = {
    val (oT, lT) = Bucketing.snowflakeTableNames(sf)
    (Seq("bkt_orders", "bkt_lineitem") ++ Seq(oT, lT))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    super.afterAll()
  }

  private lazy val tablesReady: Unit = {
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"),
      "bkt_orders", buckets = 8, key = "o_orderkey")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      "bkt_lineitem", buckets = 8, key = "l_orderkey")
  }

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed fact join + join-key aggregation plans zero exchanges") {
    tablesReady
    withNoBroadcast {
      val df = Bucketing.bucketedOrderRevenue(spark, "bkt_orders", "bkt_lineitem")
      df.collect() // finalize the adaptive plan
      val rendered = df.queryExecution.executedPlan.toString
      assert(!rendered.contains("Exchange"),
        s"expected an exchange-free plan:\n$rendered")
      // and the shuffle-free plan is a real merge join over bucket scans
      assert(rendered.contains("SortMergeJoin"), s"expected SMJ:\n$rendered")
      assert(rendered.contains("SelectedBucketsCount"), s"expected bucketed scans:\n$rendered")
    }
  }

  test("one file per bucket elides the merge-join sort") {
    tablesReady
    // Spark >= 3.0 ignores bucket sort order unless each bucket is one
    // file AND the legacy scan-ordering conf opts in (SPARK-28595); the
    // writeBucketed pre-repartition guarantees the one-file layout
    val prev = spark.conf
      .get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try withNoBroadcast {
      val df = Bucketing.bucketedOrderRevenue(spark, "bkt_orders", "bkt_lineitem")
      df.collect()
      val rendered = df.queryExecution.executedPlan.toString
      // "Sort [" matches the Sort operator in or out of codegen stages
      // ("SortMergeJoin [" does not contain the substring)
      assert(!rendered.contains("Sort ["),
        s"bucket sort order not exploited:\n$rendered")
      assert(rendered.contains("SortMergeJoin"), s"expected SMJ:\n$rendered")
    } finally spark.conf
      .set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev)
  }

  test("bucketed results match the plain parquet formulation") {
    tablesReady
    val bucketed = Bucketing.bucketedOrderRevenue(spark, "bkt_orders", "bkt_lineitem")
      .orderBy("o_orderkey").collect()
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderkey").collect()
    assert(bucketed.length == plain.length)
    assert(bucketed.sameElements(plain))
  }

  test("q26 bucketed twin: identical rows, fewer exchanges than the general path") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // finalize the adaptive plan
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    }
    withNoBroadcast {
      val bucketed = Bucketing.snowflakeRevenueBucketed(spark, sf)
      val plain = Relational.snowflakeRevenue(spark, sf)
      // the fact⋈fact edge reads co-located buckets: at least the two
      // orderkey exchanges of the general path disappear
      val (nb, np) = (exchanges(bucketed), exchanges(plain))
      assert(nb <= np - 2, s"bucketed=$nb plain=$np:\n" +
        bucketed.queryExecution.executedPlan.toString)
      assert(bucketed.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount"), "facts must read as bucket scans")
      // same rows as q26 (and so the same DuckDB oracle)
      assert(bucketed.collect().toSeq == plain.collect().toSeq)
    }
  }

  test("dropLandedTables releases the land; the next ensure re-lands") {
    val (oT, lT) = Bucketing.ensureSnowflakeTables(spark, sf)
    assert(spark.catalog.tableExists(oT) && spark.catalog.tableExists(lT))
    Bucketing.dropLandedTables(spark)
    assert(!spark.catalog.tableExists(oT) && !spark.catalog.tableExists(lT))
    // the catalog (not a memo flag) gates the rebuild — a dangling
    // name can never be served after a drop
    val (oT2, lT2) = Bucketing.ensureSnowflakeTables(spark, sf)
    assert(oT2 == oT && lT2 == lT)
    assert(spark.catalog.tableExists(oT) && spark.catalog.tableExists(lT))
  }

  test("the same join without bucketing DOES shuffle (the cost bucketing removes)") {
    withNoBroadcast {
      val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val df = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      df.collect()
      // exchanges appear in the executed plan (EnsureRequirements runs
      // in the execution preparation, after sparkPlan)
      assert(df.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"), "control query should shuffle")
    }
  }
}
