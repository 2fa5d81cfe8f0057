package graft

import graft.model.Tables
import org.apache.spark.sql.functions._

/**
 * SQL surface: the reference has no SQL layer (SURVEY.md §2.5); this
 * engine inherits a full ANSI SQL parser from Spark. Registering the
 * fixture tables as views makes every operator available as SQL text —
 * proven here by running a query both ways and comparing exactly.
 */
class SqlSurfaceSpec extends SparkSpec {

  test("SQL text and DataFrame API produce identical results") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    val viaApi = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    assert(viaSql.sameElements(viaApi))
  }

  test("custom expressions work from SQL after extension registration") {
    val (id, einfo, builder) = graft.functions.GraftExtensions.dotProductD
    spark.sessionState.functionRegistry.registerFunction(id, einfo, builder)
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product_d(embedding, embedding) AS n2 " +
        "FROM embeddings ORDER BY vec_id LIMIT 5").collect()
    val viaApi = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dot_d(col("embedding"), col("embedding")).as("n2"))
      .orderBy("vec_id").limit(5).collect()
    assert(viaSql.sameElements(viaApi))
  }

  test("operator views: SQL over a registered view matches the DataFrame form") {
    Views.register(spark, sf, Seq("q173_dup_spectrum", "q30_exact_dedup"))
    val viaView = spark.sql(
      "SELECT n_copies, n_clusters FROM q173_dup_spectrum WHERE n_copies >= 1").collect()
    val viaApi = graft.llm.Dedup.dupSpectrum(spark, sf)
      .select(col("n_copies"), col("n_clusters")).collect()
    assert(viaView.sameElements(viaApi))
    // views COMPOSE into one plan: an aggregate over the view is legal SQL
    val n = spark.sql(
      "SELECT CAST(SUM(n_copies) AS BIGINT) FROM q30_exact_dedup").head.getLong(0)
    assert(n == Tables.documents(spark, sf).count())
  }

  test("oracle SQL dialect aside, base-table views serve spark.sql directly") {
    Views.registerTables(spark, sf)
    val viaSql = spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head.getLong(0)
    assert(viaSql == Tables.lineitem(spark, sf).join(
      Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey")).count())
  }

  test("unknown operator names fail loudly at registration") {
    intercept[IllegalArgumentException] {
      Views.register(spark, sf, Seq("q999_nope"))
    }
  }
}
