package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine top-k: similarities in [-1,1], ranks contiguous, k per query") {
    val tk = Similarity.cosineTopK(spark, sf).cache()
    assert(tk.filter(col("sim") < -1.0 || col("sim") > 1.0).count() == 0)
    val perQ = tk.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rnk").as("mn"), max("rnk").as("mx"))
    assert(perQ.filter(col("n") =!= 10 || col("mn") =!= 1 || col("mx") =!= 10).count() == 0)
  }

  test("top-1 neighbor matches brute-force argmax for a sample query") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).toArray
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = all.filter(_._1 != 0L).maxBy { case (_, v) => cos(q, v) }._1
    val got = Similarity.cosineTopK(spark, sf)
      .filter(col("q_id") === 0 && col("rnk") === 1)
      .head.getLong(2)
    assert(got == expected)
  }

  test("ANN-LSH neighbors share the query's bucket and rank within it") {
    val ann = Similarity.annLsh(spark, sf).cache()
    assert(ann.count() > 0)
    val perQ = ann.groupBy("q_id", "bucket").agg(max("rnk").as("mx"))
    assert(perQ.filter(col("mx") > 5).count() == 0)
    // buckets are a partition: a query's neighbors all carry one bucket id
    assert(ann.groupBy("q_id").agg(countDistinct("bucket").as("nb"))
      .filter(col("nb") > 1).count() == 0)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val nd = Similarity.embeddingNearDup(spark, sf).cache()
    assert(nd.filter(col("sim") < 0.45).count() == 0)
    assert(nd.filter(col("id_a") >= col("id_b")).count() == 0)
  }

  test("planted-neighbor recall certifies the multi-probe index") {
    // the premise: with cosine-0.9994 planted neighbors, the exact
    // top-k of every anchor is exactly its planted set
    val exact = Similarity.cosineTopKOf(Similarity.plantedCorpus(spark, sf), 5)
    assert(exact.filter(col("neighbor_id") < Similarity.PlantedBase).count() == 0,
      "exact top-k must be dominated by the planted neighbors")
    // the certification: the multi-probe index retrieves them
    val r = Similarity.plantedRecall(spark, sf).cache()
    assert(r.filter(col("n_exact") =!= 5).count() == 0)
    val mean = r.agg(avg("recall")).head.getDouble(0)
    assert(mean >= 0.9, s"planted recall $mean below the certification bound")
  }

  test("NDCG@k bounds hold and a perfect route would score exactly 10^6") {
    val r = Similarity.annNdcg(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_queries")
    val perfect = row.getAs[Long]("n_perfect")
    val mean = row.getAs[Long]("mean_ndcg_micro")
    assert(n > 0)
    assert(perfect <= n)
    assert(mean >= 0L && mean <= 1000000L,
      s"mean ndcg_micro $mean outside [0, 10^6]")
    // the integer weights are the floor of 10^6/log2(i+1), descending
    val w = Similarity.ndcgWeightsMicro(5)
    assert(w.head == 1000000L && w == w.sortBy(-_))
    // consistency with the recall audit: if multiprobe recall is
    // perfect everywhere, ndcg must be perfect everywhere too
    val rec = Similarity.multiProbeRecall(spark, sf)
    if (rec.filter(col("recall") < 1.0).count() == 0)
      assert(perfect == n && mean == 1000000L)
  }

  test("LSH bit count grows with the corpus, holding bucket width bounded") {
    import Similarity.{lshBitsFor, MaxLshBits, TargetBucketWidth}
    assert(lshBitsFor(500) == 8)      // small corpora keep the floor
    assert(lshBitsFor(16384) == 8)    // boundary: n == width · 2^8
    assert(lshBitsFor(16385) == 9)    // one past → one more bit
    assert(lshBitsFor(100_000_000L) == MaxLshBits) // capped
    // invariant: expected width n / 2^bits stays ≤ target until the cap
    for (n <- Seq(1000L, 50_000L, 1_000_000L, 30_000_000L)) {
      val b = lshBitsFor(n)
      assert(b == MaxLshBits || (n.toDouble / (1L << b)) <= TargetBucketWidth,
        s"n=$n bits=$b width=${n.toDouble / (1L << b)}")
    }
  }

  test("hard negatives: every mined neighbor crosses the label boundary") {
    val rows = Similarity.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("neighbor_label"))
      val s = r.getAs[Double]("sim")
      assert(s >= -1.0000001 && s <= 1.0000001)
    }
    // ranks are contiguous 1..k per query, descending sim
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to g.size).toSeq)
      val sims = sorted.map(_.getAs[Double]("sim"))
      sims.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    }
    // the mined top-1 is exactly the brute-force argmax restricted to
    // other-label candidates (spot-check one probe against q34's scan)
    val q0 = rows.filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Long]("rnk") == 1L)
    q0.foreach { top =>
      val all = Similarity.cosineTopK(spark, sf, k = 400).collect()
        .filter(_.getAs[Long]("q_id") == 0L)
      val eligible = all.filter(_.getAs[Long]("neighbor_id") != top.getAs[Long]("neighbor_id"))
      // no eligible other-label candidate in the exhaustive list may
      // beat the mined top-1's similarity
      val labels = graft.model.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val qLab = top.getAs[Int]("q_label")
      eligible.filter(r => labels(r.getAs[Long]("neighbor_id")) != qLab)
        .foreach(r => assert(r.getAs[Double]("sim") <= top.getAs[Double]("sim")))
    }
  }

  test("quantized vectors replay the q93 codec exactly; quant recall is well-formed") {
    val emb = Tables.embeddings(spark, sf)
    val qv = Similarity.quantizedVectors(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    // every element is an integer in [0, 255]
    qv.values.foreach(_.foreach { v =>
      assert(v >= 0f && v <= 255f && v == math.floor(v).toFloat)
    })
    // per-vector stats agree with the q93 aggregate bit for bit
    Pipeline.quantizeEmbeddings(spark, sf).collect().foreach { r =>
      val v = qv(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("q_sum") == v.map(_.toLong).sum)
      assert(r.getAs[Long]("q_min") == v.min.toLong)
      assert(r.getAs[Long]("q_max") == v.max.toLong)
    }
    val rows = Similarity.quantRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val nHit = r.getAs[Long]("n_hit")
      assert(nExact == 5L && nHit >= 0L && nHit <= nExact)
      assert(r.getAs[Double]("recall") == nHit.toDouble / nExact.toDouble)
    }
  }

  test("matryoshka recall counts the exact overlap of full vs truncated top-k") {
    val k = 5
    val dims = 32
    val all = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def topK(qId: Long, q: Array[Float], d: Int): Set[Long] =
      all.filter(_._1 != qId)
        .map { case (id, v) => (id, cos(q, v, d)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).map(_._1).toSet
    val queries = all.filter { case (id, _) => id % 20 == 0 && id < 5120 }
    val got = Similarity.matryoshkaRecall(spark, sf, k, dims).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("recall"))).toMap
    assert(got.size == queries.length && queries.nonEmpty)
    queries.foreach { case (qId, q) =>
      val full = topK(qId, q, q.length)
      val trunc = topK(qId, q, dims)
      val (nExact, nHit, recall) = got(qId)
      assert(nExact == full.size)
      assert(nHit == (full intersect trunc).size, s"q=$qId")
      assert(recall == nHit.toDouble / nExact.toDouble)
    }
  }

  test("semantic decontamination flags a planted eval near-copy, spares the orthogonal") {
    import spark.implicits._
    // eval vector at id 0 (id % 20 == 0, under the cap); training ids
    // avoid the eval slice. 901 is the eval vector scaled — cosine 1.0,
    // contaminated; 902 is orthogonal — cosine 0, clean; 903 is a
    // mixed direction landing between the two
    val e = Array(1.0f, 0f, 0f, 0f)
    val rows = Seq(
      (0L, e),
      (901L, Array(2.0f, 0f, 0f, 0f)),
      (902L, Array(0f, 3.0f, 0f, 0f)),
      (903L, Array(1.0f, 1.0f, 0f, 0f)))
    val got = Similarity.semanticDecontaminateOf(
        rows.toDF("vec_id", "embedding"), tau = 0.3125)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.keySet == Set(901L, 902L, 903L), got)
    assert(got(901L) == ((0L, 1.0, true)), got(901L))
    assert(got(902L)._2 == 0.0 && !got(902L)._3, got(902L))
    // cos(45°) = 1/sqrt(2) ≈ 0.707 ≥ τ
    assert(got(903L)._3 && math.abs(got(903L)._2 - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
