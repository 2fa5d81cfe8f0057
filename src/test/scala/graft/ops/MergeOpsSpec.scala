package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkSpec {

  test("upsert applies inserts, updates and deletes; keys stay unique") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "U", "b2", 25.0),   // update existing
      (4L, "U", "d", 40.0),    // insert new
      (3L, "D", "", 0.0))      // delete existing
      .toDF("k", "op", "name", "v")
    val merged = MergeOps.upsert(snapshot, changes, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
    // idempotence: re-applying the same batch changes nothing
    val again = MergeOps.upsert(
      MergeOps.upsert(snapshot, changes, "k"), changes, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(again.toSeq == merged.toSeq)
  }

  test("q120 customer upsert: restated, deleted, and untouched rows all correct") {
    val r = MergeOps.customerUpsert(spark, sf).cache()
    val base = Tables.customer(spark, sf)
    // key-unique output
    assert(r.select("c_custkey").distinct().count() == r.count())
    // deletes gone, updates restated, others untouched
    assert(r.filter(pmod(col("c_custkey"), lit(11L)) === 0L &&
      pmod(col("c_custkey"), lit(7L)) =!= 0L).count() == 0)
    val joined = r.join(base.select(col("c_custkey"), col("c_acctbal").as("old")),
      "c_custkey")
    assert(joined.filter(pmod(col("c_custkey"), lit(7L)) === 0L &&
      col("c_acctbal") =!= col("old") + 100.0).count() == 0)
    assert(joined.filter(pmod(col("c_custkey"), lit(7L)) =!= 0L &&
      col("c_acctbal") =!= col("old")).count() == 0)
  }
}
