package graft.model

import graft.SparkSpec

class SchemasSpec extends SparkSpec {

  test("typed datasets decode every fixture row") {
    assert(Schemas.lineitem(spark, sf).count() > 0)
    assert(Schemas.orders(spark, sf).count() > 0)
    assert(Schemas.customer(spark, sf).count() > 0)
    assert(Schemas.events(spark, sf).count() > 0)
    assert(Schemas.documents(spark, sf).count() > 0)
    assert(Schemas.embeddings(spark, sf).head.embedding.length == 64)
  }

  test("typed groupByKey aggregation matches the untyped plan") {
    import spark.implicits._
    val typed = Schemas.lineitem(spark, sf)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L
        rows.foreach(_ => n += 1)
        (flag, n)
      }
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == untyped)
  }

  test("typed filter with compile-time fields equals Column filter") {
    val typed = Schemas.orders(spark, sf)
      .filter(o => o.o_totalprice > 150000.0 && o.o_orderstatus == "F").count()
    val untyped = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 150000.0 &&
        org.apache.spark.sql.functions.col("o_orderstatus") === "F").count()
    assert(typed == untyped)
  }
}
