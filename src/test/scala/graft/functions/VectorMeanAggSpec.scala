package graft.functions

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class VectorMeanAggSpec extends SparkSpec {

  test("vector_mean equals the posexplode composition within epsilon") {
    val emb = Tables.embeddings(spark, sf)
    val custom = emb.groupBy(col("label"))
      .agg(VectorMeanAgg.vector_mean(col("embedding")).as("centroid"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray).toMap
    val composed = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("x").cast("double")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(custom.nonEmpty)
    custom.foreach { case (label, centroid) =>
      centroid.zipWithIndex.foreach { case (v, d) =>
        val want = composed((label, d))
        assert(math.abs(v - want) < 1e-9, s"label=$label dim=$d: $v vs $want")
      }
    }
  }

  test("vector_mean survives shuffle-boundary merges (repartitioned input)") {
    val emb = Tables.embeddings(spark, sf).repartition(7)
    val r = emb.agg(VectorMeanAgg.vector_mean(col("embedding")).as("c")).head
    val c = r.getSeq[Double](0)
    assert(c.length == 64 && c.forall(v => !v.isNaN))
  }

  test("vector_mean of empty input is null") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)
    val r = emb.agg(VectorMeanAgg.vector_mean(col("embedding")).as("c")).head
    assert(r.isNullAt(0))
  }
}
