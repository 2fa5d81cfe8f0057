package graft.llm

import graft.SparkSpec
import graft.plans.PlanChecks
import org.apache.spark.sql.functions._

class MixPlanSpec extends SparkSpec {

  test("filter ablation: unique kills bound fails; survivor arithmetic consistent") {
    val rows = MixPlan.filterAblation(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (fail, uniq, ifDropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(uniq <= fail, s"rule ${r.getString(0)}: unique kills exceed fails")
      assert(ifDropped >= uniq)
    }
    // n_survivors_if_dropped − n_unique_kill is the pass-all count:
    // identical across every rule row by construction
    assert(rows.map(r => r.getLong(3) - r.getLong(2)).distinct.length == 1)
  }

  test("filter ablation plans as one scan + one group-less aggregate (no joins)") {
    val a = PlanChecks.audit(MixPlan.filterAblation(spark, sf))
    assert(a.joins == 0, a)
    assert(a.shuffleExchanges <= 1, a)
  }

  test("token budget mix: allocation is feasible and waterline-maximal") {
    val rows = MixPlan.tokenBudgetMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.map(_._2).sum
    val budget = total * 3 / 5
    val spent = rows.map(_._3).sum
    assert(spent <= budget, s"allocation $spent exceeds budget $budget")
    rows.foreach { case (s, t, a) => assert(a <= t, s"$s allocated beyond its tokens") }
    // maximality: if anything was clipped, raising the waterline by one
    // token must blow the budget
    val lambda = rows.filter { case (_, t, a) => a < t }.map(_._3).distinct
    assert(lambda.length <= 1, "clipped sources must share one waterline")
    lambda.foreach { lam =>
      val spentPlus = rows.map { case (_, t, _) => math.min(t, lam + 1) }.sum
      assert(spentPlus > budget, "waterline not maximal")
    }
  }

  test("interleave schedule round-robins sources over increasing positions") {
    // NOT gap-free-1..N: the schedule formula legitimately leaves gaps
    // once the smallest source exhausts, and fixtures regenerate
    // between rounds — assert the invariants that hold for ANY source
    // distribution instead
    val rows = MixPlan.interleaveSchedule(spark, sf).collect()
    val pos = rows.map(_.getLong(0))
    assert(pos.head >= 1L && pos.toSeq == pos.toSeq.sorted &&
      pos.distinct.length == pos.length,
      "positions must be strictly increasing from >= 1")
    val nSrc = graft.model.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    // a schedule cycle is (pos-1) div n_src; within any cycle each
    // slot belongs to a distinct source by construction
    rows.groupBy(r => (r.getLong(0) - 1L) / nSrc).values.foreach { cycle =>
      assert(cycle.map(_.getString(2)).distinct.length == cycle.length,
        "a round-robin cycle repeated a source")
    }
  }

  test("bigram novelty: slot accounting matches a direct per-doc recount") {
    val out = MixPlan.bigramNovelty(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nBi, nRare, minC, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nRare <= nBi && minC >= 1L && ppm <= 1000000L)
      assert(ppm == 1000000L * nRare / nBi)
    }
    // direct recount of one doc's bigram slots
    val doc = graft.model.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L)
      .select(size(split(col("text"), " ")).as("n")).head.getInt(0)
    val row0 = rows.find(_.getLong(0) == 0L)
    if (doc >= 2) assert(row0.exists(_.getLong(1) == doc - 1L))
  }

  test("domain reweight: weights are a clamped-excess share summing to ~1e6") {
    val rows = MixPlan.domainReweight(spark, sf).collect()
    assert(rows.nonEmpty)
    val nSrc = rows.length
    val totExcess = rows.map(_.getAs[Long]("excess_ppm")).sum
    val weights = rows.map(_.getAs[Long]("weight_ppm"))
    rows.foreach { r =>
      val (nBi, nRare) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_rare"))
      assert(r.getAs[Long]("rare_ppm") == 1000000L * nRare / nBi)
      assert(r.getAs[Long]("excess_ppm") ==
        math.max(0L, r.getAs[Long]("rare_ppm") - r.getAs[Long]("corpus_ppm")))
    }
    if (totExcess > 0L) {
      // integer-div shares: each source's floor share, so the sum can
      // undershoot 1e6 by at most one ulp per source
      rows.foreach { r =>
        assert(r.getAs[Long]("weight_ppm") ==
          1000000L * r.getAs[Long]("excess_ppm") / totExcess)
      }
      assert(weights.sum <= 1000000L && weights.sum > 1000000L - nSrc)
      // DoReMi clamp: sources at or below the corpus rate get zero
      rows.filter(_.getAs[Long]("excess_ppm") == 0L)
        .foreach(r => assert(r.getAs[Long]("weight_ppm") == 0L))
    } else weights.foreach(w => assert(w == 1000000L / nSrc))
  }

  test("temperature mix flattens the distribution: isqrt weights, exact ppm shares") {
    val rows = MixPlan.temperatureMix(spark, sf).collect()
    assert(rows.length > 1)
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum
    val rtot = rows.map(_.getAs[Long]("sqrt_tokens")).sum
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val sq = r.getAs[Long]("sqrt_tokens")
      // floor(sqrt): sq^2 <= n < (sq+1)^2
      assert(sq * sq <= n && n < (sq + 1L) * (sq + 1L), r)
      assert(r.getAs[Long]("raw_ppm") == 1000000L * n / tot)
      assert(r.getAs[Long]("temp_ppm") == 1000000L * sq / rtot)
      assert(r.getAs[Long]("boost_ppm") ==
        r.getAs[Long]("temp_ppm") - r.getAs[Long]("raw_ppm"))
    }
    // α<1 flattens: the smallest source never loses share to the
    // largest — its boost is >= the largest source's boost
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Long]("boost_ppm") >=
      bySize.last.getAs[Long]("boost_ppm"))
    // floor-division shares undershoot 1e6 by < 1 ulp per source
    val shares = rows.map(_.getAs[Long]("temp_ppm")).sum
    assert(shares <= 1000000L && shares > 1000000L - rows.length)
  }

  test("curriculum phases: ntile buckets are contiguous in rank and balanced") {
    val rows = MixPlan.curriculumPhases(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    // ranks are a permutation of 1..n
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to n).toSeq)
    // phase is monotone in rank and difficulty is monotone in rank
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("phase") <= b.getAs[Long]("phase"))
        assert(a.getAs[Long]("rare_ppm") <= b.getAs[Long]("rare_ppm"))
      case _ =>
    }
    // ANSI ntile balance: bucket sizes differ by at most one, larger first
    val sizes = rows.groupBy(_.getAs[Long]("phase")).toSeq.sortBy(_._1)
      .map { case (p, g) => (p, g.length.toLong) }
    assert(sizes.map(_._1) == (1L to sizes.length).toSeq)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1L)
    assert(sizes.map(_._2).sorted.reverse.toSeq == sizes.map(_._2).toSeq)
  }

  test("training order materializes the epoch allocation faithfully") {
    import org.apache.spark.sql.functions._
    val order = MixPlan.trainingOrder(spark, sf).cache()
    val ep = MixPlan.repeatEpochs(spark, sf)
      .select(col("source"), col("n_docs"), col("epochs_ppm")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // positions are globally unique and strictly positive
    val n = order.count()
    assert(order.select("pos").distinct().count() == n)
    assert(order.filter(col("pos") <= 0L).count() == 0)
    // per (source, epoch): whole epochs carry ALL the source's docs,
    // the fractional epoch exactly floor(n_docs·frac) of them
    val byLane = order.groupBy("source", "epoch")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(byLane.nonEmpty)
    byLane.foreach { case ((src, e), (cnt, distinctDocs)) =>
      val (nDocs, ppm) = ep(src)
      val whole = ppm / 1000000L
      val fracDocs = nDocs * (ppm % 1000000L) / 1000000L
      assert(cnt == distinctDocs, s"$src epoch $e repeats a doc within the lane")
      if (e <= whole) assert(cnt == nDocs, s"$src whole epoch $e incomplete: $cnt/$nDocs")
      else assert(cnt == fracDocs, s"$src fractional epoch $e: $cnt != $fracDocs")
    }
    // every source with a positive allocation appears
    ep.foreach { case (src, (_, ppm)) =>
      val lanes = byLane.keys.count(_._1 == src)
      val expect = (ppm / 1000000L +
        (if (ep(src)._1 * (ppm % 1000000L) / 1000000L > 0) 1 else 0)).toInt
      assert(lanes == expect, s"$src: $lanes lanes, expected $expect")
    }
    order.unpersist()
  }

  test("KN doc score matches a brute-force reimplementation on a controlled corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "the cat sat"),
      (2L, "s", "the cat ran"),
      (3L, "s", "the dog sat"),
      (4L, "s", "cat the cat")).toDF("doc_id", "source", "text")
    // brute-force KN in plain Scala, integer ppm with the same div order
    val slots = Seq(
      1L -> Seq(("the", "cat"), ("cat", "sat")),
      2L -> Seq(("the", "cat"), ("cat", "ran")),
      3L -> Seq(("the", "dog"), ("dog", "sat")),
      4L -> Seq(("cat", "the"), ("the", "cat")))
    val all = slots.flatMap(_._2)
    val c = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = c.size.toLong
    val c1 = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val fwd = c.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val bwd = c.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def score(b: (String, String)): Long =
      (1000000L * (4 * c(b) - 3)) / (4 * c1(b._1)) +
        ((3000000L * fwd(b._1)) / (4 * c1(b._1))) *
          ((1000000L * bwd(b._2)) / types) / 1000000L
    val expect = slots.map { case (id, bs) =>
      id -> (bs.size.toLong, bs.map(score).sum / bs.size, bs.map(score).min)
    }.toMap
    val got = MixPlan.knDocScoreOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect, s"got $got\nexpected $expect")
    // the model is discriminative on this corpus: the frequent
    // transition (the→cat ×3) must outscore a singleton one
    val common = score(("the", "cat"))
    val rare = score(("dog", "sat"))
    assert(common > rare, s"the→cat $common should beat dog→sat $rare")
  }

  test("perplexity buckets: exact terciles, pinned tie precedence, ppm shares") {
    import spark.implicits._
    // 9 scores 10..90: t1 = 1 + (1/3)(8) = rank 3.67 → 36.67,
    // t2 = rank 6.33 → 63.33 (quantile_cont interpolation); buckets
    // must split 3/3/3 with CASE precedence >= t2 / > t1
    val scores = (1L to 9L).map(i => (i, 2L, i * 10L))
      .toDF("doc_id", "n_slots", "kn_mean_ppm")
    val got = MixPlan.knBucketsFromScores(scores).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("tail") == ((3L, 6L, 10L, 30L, 333333L)), got("tail"))
    assert(got("middle") == ((3L, 6L, 40L, 60L, 333333L)), got("middle"))
    assert(got("head") == ((3L, 6L, 70L, 90L, 333333L)), got("head"))
    // boundary values: for n=4, pos = 1 + (1/3)·3 rounds to exactly
    // 2.0 in IEEE double (2−2⁻⁵⁴ is closer to 2 than to the next
    // representable below), so t1 = 20 and t2 = 30 EXACTLY; the
    // pinned precedence then puts the value AT t1 in tail (not >) and
    // AT t2 in head (≥) — the no-middle degenerate split
    val ties = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 30L), (4L, 1L, 40L))
      .toDF("doc_id", "n_slots", "kn_mean_ppm")
    val tied = MixPlan.knBucketsFromScores(ties).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tied == Map("tail" -> 2L, "head" -> 2L),
      s"20 ≤ t1 → tail, 30 ≥ t2 → head, no middle: $tied")
    // fixture-level: the three buckets partition the scored docs and
    // their value ranges are disjoint and ordered
    val fx = MixPlan.knPerplexityBuckets(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val scored = MixPlan.knDocScore(spark, sf).count()
    assert(fx.values.map(_._1).sum == scored)
    assert(fx("tail")._3 < fx("middle")._2 ||
      fx("tail")._3 <= fx("middle")._2, fx.toString)
    assert(fx("middle")._3 <= fx("head")._2, fx.toString)
  }

  test("trim bucket-shift: the spliced doc climbs out of tail, clean docs " +
    "hold their bucket, nothing moves down") {
    import spark.implicits._
    // the q266 spec corpus: ten clean background docs, doc 0 carries a
    // shuffled-vocab splice (one-third of its slots score ~0), doc 4 a
    // 1-word fragment. PRE: doc 0's slot-weighted mean is dragged to
    // ~2/3 of the background's — the corpus minimum — so it anchors
    // tail. POST (frozen thresholds): the trim removes exactly the
    // splice, doc 0's mean rejoins the background band.
    val bg = (5L to 14L).map(i =>
      (i, "s", Seq.fill(4)("the cat sat on").mkString(" ")))
    val docs = (bg :+
      (0L, "s", "the cat sat on on sat cat the the cat sat on") :+
      (4L, "s", "the cat sat on the"))
      .toDF("doc_id", "source", "text")
    val got = MixPlan.trimBucketShiftOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val order = Map("tail" -> 0, "middle" -> 1, "head" -> 2)
    // every doc participates; nothing is fully dropped
    assert(got.values.sum == 12L, got.toString)
    assert(!got.keys.exists(_._2 == "dropped"), got.toString)
    // exactly one doc moves, it starts in tail, and it moves UP
    val moved = got.filter { case ((a, b), _) => a != b }
    assert(moved.size == 1 && moved.keys.head._1 == "tail" &&
      order(moved.keys.head._2) > order("tail"),
      s"the spliced doc must climb out of tail: $got")
    assert(moved.values.head == 1L, got.toString)
    // no doc moves DOWN a bucket — the trim only removes
    // below-threshold paragraphs, which raises slot-weighted means
    assert(!got.keys.exists { case (a, b) =>
      b != "dropped" && order(b) < order(a) }, got.toString)
    // fixture-level: matrix covers every scored doc, shares sum to ~1e6
    val fx = MixPlan.trimBucketShift(spark, sf).collect()
    val scoredDocs = MixPlan.scoredParagraphsOf(
      graft.model.Tables.documents(spark, sf))
      .select("doc_id").distinct().count()
    assert(fx.map(_.getLong(2)).sum == scoredDocs)
    val share = fx.map(_.getLong(3)).sum
    assert(share >= 999000L && share <= 1000000L, s"shares sum $share")
  }

  test("trim-aware mix: a source whose tokens are mostly trimmed loses " +
    "its mix share (q269)") {
    import spark.implicits._
    // two sources with IDENTICAL pre-trim token mass: 'good' is the
    // corpus-dominant fluent phrase (its transitions ARE the LM);
    // 'junk' is per-doc-unique vocabulary — every transition a one-off,
    // scoring far under half the corpus mean, so the trim drops it
    val good = (0 until 10).map(i =>
      (i * 4L, "good", Seq.fill(4)("the cat sat on").mkString(" ")))
    val junk = (0 until 10).map(i =>
      (40L + i * 4L, "junk", (0 until 16).map(j => s"w${i}x$j").mkString(" ")))
    val docs = (good ++ junk).toDF("doc_id", "source", "text")
    val got = MixPlan.trimAwareMixOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (gPre, gPost, gAlloc) = got("good")
    val (jPre, jPost, jAlloc) = got("junk")
    // equal footing before the trim
    assert(gPre == 160L && jPre == 160L, got.toString)
    assert(gPost == 160L, s"the fluent source must keep everything: $got")
    assert(jPost < jPre / 2, s"the gibberish source must be mostly trimmed: $got")
    // the budget is planned over POST-trim tokens: the trimmed source
    // competes with only what survived, and loses share accordingly
    assert(jAlloc <= jPost, s"alloc must be bounded by post-trim tokens: $got")
    assert(gAlloc > jAlloc,
      s"equal PRE sizes, so the trimmed source must lose mix share: $got")
    // fixture-level: allocation never exceeds a source's post-trim mass
    val fx = MixPlan.trimAwareMix(spark, sf).collect()
    assert(fx.nonEmpty && fx.forall(r => r.getLong(3) <= r.getLong(2)),
      "alloc must be bounded by post_tokens on the fixture")
    assert(fx.forall(r => r.getLong(2) <= r.getLong(1)),
      "post_tokens can never exceed pre_tokens")
  }

  test("trim-aware temperature: shares computed over POST-trim mass; the " +
    "flattening boosts the smaller SURVIVING source (q270)") {
    import spark.implicits._
    // three sources: 'good' dominant fluent, 'small' fluent but 3 docs,
    // 'junk' per-doc-unique vocabulary (trimmed away)
    val good = (0 until 10).map(i =>
      (i * 4L, "good", Seq.fill(4)("the cat sat on").mkString(" ")))
    val junk = (0 until 10).map(i =>
      (40L + i * 4L, "junk", (0 until 16).map(j => s"w${i}x$j").mkString(" ")))
    val small = (0 until 3).map(i =>
      (80L + i * 4L, "small", Seq.fill(4)("the cat sat on").mkString(" ")))
    val docs = (good ++ junk ++ small).toDF("doc_id", "source", "text")
    val got = MixPlan.trimAwareTemperatureOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    val (jPre, jPost, _, jTemp, _) = got("junk")
    val (_, gPost, gRaw, gTemp, gBoost) = got("good")
    val (_, sPost, sRaw, sTemp, sBoost) = got("small")
    // the trimmed source's sampling share collapses with its post mass
    assert(jPost < jPre / 2, s"junk must be mostly trimmed: $got")
    assert(jTemp < 100000L,
      s"junk's temperature share must collapse with its post-trim mass: $got")
    // both fluent sources survive whole
    assert(gPost == 160L && sPost == 48L, got.toString)
    // α = 0.5 still flattens among SURVIVORS: small boosted, good damped
    assert(sBoost > 0L && sTemp > sRaw,
      s"the smaller surviving source must gain share: $got")
    assert(gBoost < 0L && gTemp < gRaw,
      s"the dominant source must be flattened down: $got")
    // fixture-level: shares are a near-partition of 1e6
    val fx = MixPlan.trimAwareTemperature(spark, sf).collect()
    val tsum = fx.map(_.getLong(5)).sum
    assert(tsum >= 999000L && tsum <= 1000000L, s"temp shares sum $tsum")
  }

  test("paragraph LM trim drops a shuffled-vocab splice and nothing else") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // ten background docs of a frequent phrase give the LM its mass;
    // doc 0 (k = 4) splices a SHUFFLED paragraph between two good ones
    // — same words, so per-word frequency can't flag it; every
    // TRANSITION is a one-off against a large c(w1), so its KN mean is
    // two orders below the corpus mean; doc 4 (k = 4) carries a
    // trailing 1-word fragment, the unscorable-paragraph policy case
    val bg = (5L to 14L).map(i =>
      (i, "s", Seq.fill(4)("the cat sat on").mkString(" ")))
    val docs = (bg :+
      (0L, "s", "the cat sat on on sat cat the the cat sat on") :+
      (4L, "s", "the cat sat on the"))
      .toDF("doc_id", "source", "text")
    val got = MixPlan.paragraphLmTrimOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 0: ONLY the gibberish middle paragraph drops; the reassembled
    // kept text is the two good paragraphs in original order
    assert(got(0L) == ((3L, 2L, 8L, md5hex("the cat sat on the cat sat on"))),
      s"doc 0: ${got(0L)}")
    // doc 4: the 1-word tail has no bigram slots — unscorable, dropped
    assert(got(4L) == ((2L, 1L, 4L, md5hex("the cat sat on"))), s"doc 4: ${got(4L)}")
    // background docs: every multi-word paragraph survives (their
    // transitions ARE the corpus mean); only subword fragments drop
    bg.foreach { case (id, _, text) =>
      val k = (4 + id % 4).toInt
      val paras = text.split(" ").grouped(k).toSeq
      val scorable = paras.count(_.length >= 2).toLong
      val (nParas, nKept, _, _) = got(id)
      assert(nParas == paras.length.toLong && nKept == scorable,
        s"doc $id: kept $nKept of $nParas, expected $scorable scorable")
    }
  }
}
