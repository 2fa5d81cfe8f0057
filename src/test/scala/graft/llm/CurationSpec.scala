package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("rerank: contiguous final ranks, sims in [-1,1], rank stages coherent") {
    val rows = Curation.rerank(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"q=$q ranks $ranks")
      assert(ranks.length <= 5)
      // final order follows exact sim desc (neighbor_id tiebreak)
      val bySim = rs.sortBy(r => (-r.getDouble(3), r.getLong(2))).map(_.getLong(1)).toSeq
      assert(bySim == rs.sortBy(_.getLong(1)).map(_.getLong(1)).toSeq)
    }
    assert(rows.forall(r => r.getDouble(3) >= -1.0001 && r.getDouble(3) <= 1.0001))
  }

  test("rerank plans both stages through TopKPerKey with no window") {
    val df = Curation.rerank(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("TopKPerKey"), s"no bounded-heap operator:\n$plan")
    assert(!plan.contains("Window "), s"rerank must not plan a window:\n$plan")
  }

  test("cross-source matrix partitions the q32 pair set") {
    val cells = Curation.crossSourceNearDup(spark, sf).collect()
    val total = Dedup.minhashLsh(spark, sf).count()
    assert(cells.map(_.getLong(2)).sum == total,
      "matrix cells must partition the verified pair set")
    cells.foreach { r =>
      assert(r.getString(0) <= r.getString(1), s"pair sources not canonical: $r")
      assert(r.getDouble(3) >= 0.5 && r.getDouble(4) <= 1.0)
    }
  }

  test("horizon dedup keeps exactly the first event per (user, type, day)") {
    val rows = Curation.horizonDedup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
    // direct recompute for one event type
    val et = rows.head.getString(0)
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .select(col("user_id"), Tables.epochMs(col("ts")).as("ts_ms"))
      .withColumn("day", expr("ts_ms div 86400000"))
      .select(col("user_id"), col("day")).distinct().count()
    assert(rows.head.getLong(2) == expected,
      s"kept count for $et should equal distinct (user, day) buckets")
  }

  test("quantile normalization: pr in [0,1], monotone in n_chars per source") {
    val rows = Curation.quantileNormalize(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 9))
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(3))
        case _ => ()
      }
      assert(sorted.last.getDouble(3) == 1.0)
      assert(sorted.head.getDouble(3) == 0.0)
    }
  }

  test("token-budget bins: contiguous bins conserving docs and tokens") {
    val rows = Curation.tokenBudgetBins(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == rows.indices.map(_.toLong))
    val docs = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("t"))
    assert(rows.map(_.getLong(1)).sum == docs.count())
    assert(rows.map(_.getLong(2)).sum ==
      docs.agg(sum(col("t"))).head.getLong(0))
    // greedy packing: when bin b+1 opened, the cumulative token count
    // had reached (b+1)·budget — so every non-final prefix closes at or
    // over its budget line
    val prefix = rows.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    rows.init.zip(prefix.init).foreach { case (r, cum) =>
      assert(cum >= (r.getLong(0) + 1) * Curation.BinTokenBudget,
        s"bin ${r.getLong(0)} closed under budget: cum=$cum")
    }
  }

  test("lang confusion: cells partition the corpus, diagonal dominates") {
    val cells = Curation.langConfusion(spark, sf).collect()
    assert(cells.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    // per-language shares sum to 1
    cells.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    }
    // the marker classifier should beat uniform-random over 5 classes
    // (fixture docs are synthetic word soup, so the bar is chance, not
    // production accuracy — the matrix exists to REPORT this honestly)
    val diag = cells.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(diag * 5 > Tables.documents(spark, sf).count(), "classifier no better than random")
  }

  test("chunk dedup: ratios in [0,1], duplicated chunks bounded by totals") {
    val rows = Curation.chunkDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val totalChunks = TextAnalysis.chunkDocuments(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == totalChunks)
  }

  test("shingle novelty: distinct never exceeds slots; ratio in [0,1)") {
    val rows = Curation.shingleNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"distinct > slots: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
  }

  test("dim stats: 64 dims, variance non-negative and consistent with min/max") {
    val rows = Curation.dimStats(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (mn, mx, mean, v) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mean >= mn && mean <= mx)
      assert(v >= -1e-9, s"negative variance: $r")
      // population variance is bounded by the squared half-range
      val half = (mx - mn) / 2.0
      assert(v <= half * half + 1e-6, s"variance beyond range bound: $r")
    }
  }

  test("path trigrams: counts descend under the total order, paths from real types") {
    val rows = Curation.pathTrigrams(spark, sf).collect()
    assert(rows.length <= 25 && rows.nonEmpty)
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(types(r.getString(0)) && types(r.getString(1)) && types(r.getString(2)))
      assert(r.getLong(3) >= 1)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) >= b.getLong(3))
      case _ => ()
    }
  }

  test("simpson diversity: ppm in range, token sums match, uniform toy corpus maxes out") {
    val rows = Curation.simpsonDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, nTok, vocab, ppm) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok == bySource(src), s"token count mismatch for $src")
      assert(vocab >= 1 && vocab <= nTok)
      assert(ppm >= 0 && ppm <= 1000000L, s"ppm out of range: $ppm")
    }
    // degenerate check on a toy frame: all-distinct tokens → ppm = 1e6
    // exactly (collision sum is 0); all-same token → ppm = 0
    import spark.implicits._
    val toy = Seq(("s1", 1L, "a b c d"), ("s2", 2L, "x x x x"))
      .toDF("source", "doc_id", "text")
    val t = toy.select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), md5(col("tok")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("n") * (col("n") - lit(1L))).as("coll2"))
      .withColumn("simpson_ppm",
        expr("1000000 - (1000000 * coll2) div (n_tokens * (n_tokens - 1))"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(t("s1") == 1000000L && t("s2") == 0L)
  }

  test("bm25: bounded result, monotone scores, positive-score filter holds") {
    val rows = Curation.bm25(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    // non-increasing with doc_id tiebreak: the cut is deterministic
    scores.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    rows.sliding(2).foreach {
      case Array(a, b) if a.getAs[Double]("score") == b.getAs[Double]("score") =>
        assert(a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"))
      case _ =>
    }
    // a scored doc must actually contain at least one query term
    rows.foreach { r =>
      assert(r.getAs[Long]("tf0") + r.getAs[Long]("tf1") + r.getAs[Long]("tf2") > 0L)
    }
  }

  test("source divergence: tv_ppm is a valid fixed-point TV distance") {
    val rows = Curation.sourceDivergence(spark, sf).collect()
    val nSrc = graft.model.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length == nSrc)
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv_ppm")
      assert(tv >= 0L && tv <= 1000000L, s"${r.getString(0)}: tv=$tv")
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
    // TV to the pooled distribution can't be maximal for every source:
    // the pool contains each source, so at least one sits well inside
    assert(rows.map(_.getAs[Long]("tv_ppm")).min < 500000L)
  }

  test("source pagerank: mass conserved within truncation, weights recount") {
    val rows = Curation.sourcePagerank(spark, sf).collect()
    val nSrc = graft.model.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length == nSrc)
    val s = nSrc
    val base = 150L * (1000000000L / s) / 1000L
    rows.foreach { r =>
      assert(r.getAs[Long]("pagerank_ppb") >= base)
      assert(r.getAs[Long]("w_total") >= 1L, "self-loop guarantees out-weight")
    }
    // integer truncation only ever LOSES mass: the total stays within
    // a generous slack under 1e9 but never exceeds it
    val total = rows.map(_.getAs[Long]("pagerank_ppb")).sum
    assert(total <= 1000000000L && total > 900000000L, s"total=$total")
    // w_total recounts from the overlap matrix (+1 self-loop)
    val inter = Dedup.sourceOverlap(spark, sf).collect()
      .flatMap(r => Seq(r.getString(0) -> r.getAs[Long]("n_inter"),
        r.getString(1) -> r.getAs[Long]("n_inter")))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    rows.foreach { r =>
      assert(r.getAs[Long]("w_total") ==
        inter.getOrElse(r.getString(0), 0L) + 1L)
    }
  }

  test("zipf deviation: exact r*f(r)/f(1) ppm over the per-source top-10") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    docs.foreach { case (s, text) =>
      text.split(" ", -1).foreach(w => counts((s, w)) += 1L)
    }
    val expected = counts.toSeq.groupBy(_._1._1).flatMap { case (s, g) =>
      val top = g.map { case ((_, w), n) => (w, n) }
        .sortBy { case (w, n) => (-n, w) }.take(10)
      val f1 = top.head._2
      top.zipWithIndex.map { case ((w, n), i) =>
        val r = i + 1L
        (s, r, w, n, r * n, 1000000L * r * n / f1)
      }
    }.toSet
    val rows = Curation.zipfDeviation(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("rnk"),
      r.getAs[String]("w"), r.getAs[Long]("n_sw"), r.getAs[Long]("rf"),
      r.getAs[Long]("zipf_ppm"))).toSet == expected)
    // rank 1 is the Zipf anchor by construction
    rows.filter(_.getAs[Long]("rnk") == 1L)
      .foreach(r => assert(r.getAs[Long]("zipf_ppm") == 1000000L))
  }

  test("cluster terms rank tokens by the exact lift over the semantic cells") {
    // independent cell assignment: the SemDeDup quantizer (q162) runs
    // the same deterministic Lloyd's + nearest-cell rule
    val cellOf = Dedup.semanticDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1)))
    val ct = scala.collection.mutable.Map.empty[(Long, String), Long]
      .withDefaultValue(0L)
    docs.foreach { case (id, text) =>
      text.split(" ", -1).foreach(t => ct((cellOf(id), t)) += 1L)
    }
    val byTok = ct.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val byCell = ct.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val n = byTok.values.sum
    val rows = Curation.clusterTerms(spark, sf).collect()
    assert(rows.nonEmpty)
    // expected top-5 per cell by (lift desc, n_ct desc, tok asc)
    val expected = ct.toSeq.filter(_._2 >= 10L)
      .map { case ((c, t), nct) =>
        (c, t, nct, nct.toDouble * n / (byTok(t).toDouble * byCell(c))) }
      .groupBy(_._1)
      .flatMap { case (c, g) =>
        g.sortBy { case (_, t, nct, lift) => (-lift, -nct, t) }
          .take(5).zipWithIndex
          .map { case ((_, t, nct, lift), i) => (c, i + 1L, t, nct, lift) }
      }.toSet
    assert(rows.map(r => (r.getAs[Long]("cell"), r.getAs[Long]("rk"),
      r.getAs[String]("tok"), r.getAs[Long]("n_ct"),
      r.getAs[Double]("lift"))).toSet == expected)
  }

  test("boilerplate prefixes flag exactly the repeated 8-token prefixes per source") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ", -1).take(8).mkString(" ")))
    val counts = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val srcDocs = docs.groupBy(_._1).map { case (s, v) => s -> v.length.toLong }
    val expected = counts.filter(_._2 >= 2L)
    val rows = Curation.boilerplatePrefixes(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      expected.keySet)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_docs") == expected(key))
      assert(r.getAs[Long]("src_docs") == srcDocs(r.getString(0)))
      assert(r.getAs[Long]("share_ppm") ==
        1000000L * expected(key) / srcDocs(r.getString(0)))
    }
  }
}
