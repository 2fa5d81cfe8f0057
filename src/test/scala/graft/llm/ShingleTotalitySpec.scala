package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression: the shingle transform must be TOTAL. Over RDD-backed
  * inputs (streaming micro-batches, checkpointed frames) a downstream
  * explode's inferred constraints land in the same Filter as the
  * <3-token guard, and interpreted-mode subexpression elimination
  * evaluates the transform eagerly — before the AND can short-circuit
  * — so a non-total expression threw INVALID_ARRAY_INDEX on short
  * docs under ANSI semantics. LocalRelation inputs fold the filter at
  * optimization time, which is why only the streamed path saw it. */
class ShingleTotalitySpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "one two"), // shorter than a shingle — must not throw anywhere
    (2L, "a"),
    (3L, "a b c d e")
  ).toDF("doc_id", "text").localCheckpoint()

  test("withShingleArray survives short docs on an RDD-backed input") {
    val out = Dedup.withShingleArray(docs)
      .select($"doc_id", explode($"sh").as("s")).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq == Seq(3L))
    assert(out.map(_.getString(1)).sorted.toSeq ==
      Seq("a_b_c", "b_c_d", "c_d_e"))
  }

  test("shingles and sourceGramProjection survive short docs too") {
    val sh = Dedup.shingles(docs).collect()
    assert(sh.map(_.getLong(0)).distinct.toSeq == Seq(3L))
    val grams = Dedup.sourceGramProjection(
      docs.withColumn("source", lit("s"))).collect()
    assert(grams.length == 3) // the three shingles of doc 3, hashed
  }
}
