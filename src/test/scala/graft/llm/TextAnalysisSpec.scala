package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("gopher rules: flags recompute from raw text; pass is the conjunction") {
    val rows = TextAnalysis.gopherRules(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass") ==
        (r.getAs[Boolean]("ok_nwords") && r.getAs[Boolean]("ok_wlen") &&
          r.getAs[Boolean]("ok_stop")))
      assert(r.getAs[Long]("n_words") >= 1L)
      assert(r.getAs[Long]("mean_wlen_centi") >= 100L,
        "every non-empty word is at least one char")
    }
    // recompute one doc by hand
    val doc0 = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select(col("text")).head.getString(0)
    val ws = doc0.split(" ")
    val r0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(r0.getAs[Long]("n_words") == ws.length.toLong)
    assert(r0.getAs[Long]("mean_wlen_centi") ==
      100L * ws.map(_.length.toLong).sum / ws.length)
    assert(r0.getAs[Long]("n_stop") == ws.count(w => w == "the" || w == "a").toLong)
  }

  test("chunk pairs: adjacency reconstructs from the doc's own tokens") {
    val rows = TextAnalysis.chunkPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    // pair count per doc is exactly chunks - 1
    val chunksPerDoc = TextAnalysis.chunkDocuments(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id")).map { case (k, v) => k -> v.length }
    val pairsPerDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, v) => k -> v.length }
    chunksPerDoc.foreach { case (d, c) =>
      assert(pairsPerDoc.getOrElse(d, 0) == c - 1, s"doc $d: $c chunks")
    }
    // spot-check: doc 0's first pair is words [0,32) and [24,56)
    val doc0 = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select(col("text")).head.getString(0)
      .split(" ")
    rows.filter(r => r.getAs[Long]("doc_id") == 0L &&
        r.getAs[Long]("pair_id") == 0L).foreach { r =>
      assert(r.getAs[String]("text_a") == doc0.slice(0, 32).mkString(" "))
      assert(r.getAs[String]("text_b") == doc0.slice(24, 56).mkString(" "))
    }
  }

  test("gopher rules plan is row-local: no joins, no corpus shuffle before the sort") {
    val a = graft.plans.PlanChecks.audit(TextAnalysis.gopherRules(spark, sf))
    assert(a.joins == 0, a)
    // the only exchange is the final presentation sort's range partition
    assert(a.shuffleExchanges <= 1, a)
  }

  test("winnowing detects every planted >=w+k-1-token repeat, never sub-gram overlap") {
    import spark.implicits._
    // 7 tokens = w + k - 1 at (k=4, w=4): the winnowing guarantee's
    // exact detection threshold
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight"),
      (2L, s"nine ten eleven twelve $shared thirteen fourteen"),
      // 3-token overlap (below the gram size k): no shared gram can
      // exist, so no fingerprint may match docs 3/4
      (3L, "alpha beta gamma completely different tail words go here okay"),
      (4L, "unrelated content with alpha beta gamma inside another spot place"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowedFingerprintsOf(docs, k = 4, w = 4, limit = 100)
      .collect()
    assert(fps.nonEmpty, "the planted 7-token repeat must share a fingerprint")
    assert(fps.forall(r => r.getAs[Long]("first_doc") == 1L &&
      r.getAs[Long]("last_doc") == 2L),
      s"only docs 1/2 share a >=7-token passage: ${fps.mkString(", ")}")
    // robustness to phase: embedding the same passage at DIFFERENT
    // offsets (above) still matched — the rightmost-min rule picks
    // fingerprints by local context, not window alignment
  }

  test("decontamination flags exactly the training docs sharing an eval passage") {
    import spark.implicits._
    // doc 100 is the eval doc (100 % 50 == 0); docs 7 and 23 embed its
    // 7-token passage at different offsets; docs 8 and 150 share
    // nothing long enough (sub-gram overlap only)
    val leaked = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (100L, s"the held out benchmark question is $leaked end of prompt"),
      (7L,   s"training web page containing $leaked scraped verbatim today"),
      (23L,  s"$leaked appears right at the start of this one"),
      (8L,   "alpha beta gamma but then it diverges completely from there"),
      (150L, "another clean training document with nothing shared at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateOf(docs, k = 4, w = 4, evalMod = 50)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(7L, 23L),
      s"exactly docs 7 and 23 are contaminated: ${out.mkString(", ")}")
    assert(out.forall(_.getLong(2) == 1L), "each matched one eval doc")
  }

  test("Misra-Gries coverage holds on every partition layout") {
    import spark.implicits._
    // adversarial mix: two true heavy hitters drowned in a long tail of
    // near-unique noise tokens, checked across layouts from 1 to many
    // partitions (the MG guarantee must hold under each)
    val docs = (
      Seq.fill(400)("hot alpha") ++ Seq.fill(250)("hot beta") ++
        (0 until 600).map(i => s"noise$i filler${i % 7}"))
      .zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(1, 3, 16).foreach { parts =>
      val out = TextAnalysis.heavyHittersOf(docs.repartition(parts), k = 8)
        .collect()
      assert(out.forall(_.getBoolean(2)),
        s"MG coverage violated at $parts partitions: ${out.mkString(", ")}")
      // the exact side is layout-independent: 'hot' tops the list
      assert(out.head.getString(0) == "hot" && out.head.getLong(1) == 650)
    }
  }

  test("lang-id predicts a language for every document") {
    val df = TextAnalysis.langId(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(!col("pred").isin("en", "de", "es", "fr", "zh")).count() == 0)
  }

  test("quality score components are bounded and consistent") {
    val q = TextAnalysis.qualityScore(spark, sf).cache()
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(q.filter(col("n_stop") > col("n_tokens")).count() == 0)
    assert(q.filter(col("avg_word_len") <= 0).count() == 0)
  }

  test("token stats: alpha runs bounded by whitespace tokens' worth of content") {
    val t = TextAnalysis.tokenStats(spark, sf).cache()
    assert(t.filter(col("ws_tokens") <= 0).count() == 0)
    assert(t.filter(col("chars_per_token") <= 0).count() == 0)
  }

  test("fingerprint is deterministic and collision-free on distinct fixture texts") {
    val fp1 = TextAnalysis.fingerprint(spark, sf).collect()
    val fp2 = TextAnalysis.fingerprint(spark, sf).collect()
    assert(fp1.sameElements(fp2))
    // 500 docs into a ~1e9 hash space: collisions astronomically unlikely;
    // any collision here would signal a broken fold
    val fps = fp1.map(_.getLong(1))
    assert(fps.distinct.length == fps.length)
  }

  test("bigram stats: probabilities are consistent conditional frequencies") {
    val bg = TextAnalysis.bigramStats(spark, sf, minCount = 2L).cache()
    assert(bg.count() > 0)
    // every surviving bigram is a sub-count of its first-word total and
    // p is exactly the ratio
    assert(bg.filter(col("n_bigram") > col("n_first")).count() == 0)
    assert(bg.filter(col("p") <= 0.0 || col("p") > 1.0).count() == 0)
    assert(bg.filter(
      col("p") =!= col("n_bigram").cast("double") / col("n_first")).count() == 0)
    // unfiltered conditional distribution sums to 1 per first word
    val full = TextAnalysis.bigramStats(spark, sf, minCount = 1L)
    val sums = full.groupBy("w1").agg(sum("p").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
    assert(sums.count() == 0, "P(w2|w1) must sum to 1 per w1")
  }

  test("repeated passages: cross-doc 5-grams with consistent counts") {
    val rp = TextAnalysis.repeatedPassages(spark, sf).cache()
    assert(rp.count() > 0, "fixture near-dup docs must share 5-gram passages")
    assert(rp.filter(col("n_docs") < 2).count() == 0)
    // occurrences can't be fewer than the docs containing the passage,
    // and first/last doc bracket correctly
    assert(rp.filter(col("n_occurrences") < col("n_docs")).count() == 0)
    assert(rp.filter(col("first_doc") >= col("last_doc")).count() == 0)
    assert(rp.filter(size(split(col("passage"), " ")) =!= 5).count() == 0)
  }

  test("source quality profile: ordered quantiles, exact average") {
    val p = TextAnalysis.sourceQualityProfile(spark, sf).cache()
    assert(p.count() > 1)
    assert(p.filter(col("p25_chars") > col("p50_chars") ||
      col("p50_chars") > col("p75_chars")).count() == 0)
    assert(p.filter(
      col("avg_chars") =!= col("sum_chars").cast("double") / col("n_docs"))
      .count() == 0)
    val total = p.agg(sum("n_docs")).first().getLong(0)
    assert(total == graft.model.Tables.documents(spark, sf).count())
  }

  test("oov rate: bounded, exact ratio, one row per doc") {
    val o = TextAnalysis.oovRate(spark, sf).cache()
    assert(o.count() == graft.model.Tables.documents(spark, sf).count())
    assert(o.filter(col("oov_rate") < 0.0 || col("oov_rate") > 1.0).count() == 0)
    assert(o.filter(col("n_oov") > col("n_tokens")).count() == 0)
    assert(o.filter(
      col("oov_rate") =!= col("n_oov").cast("double") / col("n_tokens"))
      .count() == 0)
    // a 20-word head over a ~40-word vocabulary must leave some OOV mass
    assert(o.agg(sum("n_oov")).first().getLong(0) > 0)
  }

  test("digit redaction: scrubbed text has no digits, counts agree") {
    val r = TextAnalysis.redactDigits(spark, sf).cache()
    assert(r.count() == graft.model.Tables.events(spark, sf).count())
    assert(r.filter(col("scrubbed").rlike("[0-9]")).count() == 0)
    // every digit run is at least one digit wide
    assert(r.filter(col("n_digits") < col("n_runs")).count() == 0)
    // props JSON carries numeric values, so redactions must happen
    assert(r.agg(sum("n_runs")).first().getLong(0) > 0)
  }

  test("token fertility: langs partition the corpus, ppm is the exact integer ratio") {
    val docs = graft.model.Tables.documents(spark, sf)
    val f = TextAnalysis.tokenFertility(spark, sf).collect()
    assert(f.map(_.getAs[Long]("n_docs")).sum == docs.count())
    f.foreach { r =>
      // ppm is the exact integer ratio of the two sums (split() counts
      // empty strings under repeated spaces, so no >= 1e6 floor is
      // assumed — only arithmetic consistency)
      assert(r.getAs[Long]("fertility_ppm") ==
        1000000L * r.getAs[Long]("n_bpe_tokens") / r.getAs[Long]("n_words"), r)
      assert(r.getAs[Long]("n_words") > 0 && r.getAs[Long]("n_bpe_tokens") > 0, r)
    }
    // per-lang doc counts agree with a direct group-by
    val direct = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    f.foreach(r => assert(direct(r.getString(0)) == r.getAs[Long]("n_docs")))
  }

  test("readability: counts recompute row-locally and the band matches the fraction") {
    val texts = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = TextAnalysis.readability(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val s = math.max(1L, text.count(".!?".contains(_)).toLong)
      val w = text.split(" ", -1).length.toLong
      val syl = math.max(1L,
        "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong)
      assert(r.getAs[Long]("sentences") == s, r)
      assert(r.getAs[Long]("words") == w, r)
      assert(r.getAs[Long]("syllables") == syl, r)
      assert(r.getAs[Long]("wps_ppm") == 1000000L * w / s)
      assert(r.getAs[Long]("spw_ppm") == 1000000L * syl / w)
      val num = 39L * w * w + 1180L * syl * s - 1559L * s * w
      assert(r.getAs[Long]("fk_num") == num)
      assert(r.getAs[Long]("fk_den") == 100L * s * w)
      val band =
        if (num < 600L * s * w) "easy"
        else if (num < 1000L * s * w) "medium"
        else if (num < 1400L * s * w) "hard"
        else "very_hard"
      assert(r.getAs[String]("band") == band, r)
    }
  }

  test("cdc chunks: boundaries are content-defined — a shifted duplicate re-chunks identically") {
    import spark.implicits._
    // 200 deterministic pseudo-random tokens; docB prepends 7 tokens
    // (a phase shift that would misalign EVERY fixed-stride window)
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(200)("t" + rnd.nextInt(500))
    val prefix = Seq.fill(7)("p" + rnd.nextInt(500))
    val docs = Seq(
      (1L, toks.mkString(" "), "en", "sA", 0L),
      (2L, (prefix ++ toks).mkString(" "), "en", "sB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = TextAnalysis.cdcChunkTable(docs)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[String]("h")).toSet }
    val shared = chunks(1L).intersect(chunks(2L))
    // every interior chunk of the common suffix must re-align once the
    // window clears the edit — CDC's whole reason to exist; demand a
    // majority shared, not a lucky one
    assert(shared.size * 2 > chunks(1L).size,
      s"only ${shared.size}/${chunks(1L).size} chunks survived the shift")
    // chunk lengths partition each doc: sum of lens == token count
    val lens = TextAnalysis.cdcChunkTable(docs)
      .groupBy(col("doc_id")).agg(sum(col("len")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lens(1L) == 200L && lens(2L) == 207L, lens)
    // per-source report shape on the fixture
    val rows = TextAnalysis.cdcChunks(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("dup_ppm") >= 0L && r.getAs[Long]("dup_ppm") <= 1000000L)
    }
  }

  test("html extract: anchor accounting and keep verdict hand-checked") {
    import spark.implicits._
    // 10 words -> anchors wrap words 5 and 10; nav adds home+source,
    // footer adds 'about us'
    val words = (1 to 10).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" "), "en", "srcA", 40L),
      // 4 words: no inline anchor at all — only nav/footer boilerplate
      (2L, "a b c d", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.htmlExtractOf(docs, maxDensityPpm = 400000L,
      minWords = 5).collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    // extracted text = doc home srcA w1..w10 about us -> 15 words (the
    // title's "doc" survives the tag strip too — extraction keeps ALL
    // rendered text; the density filter is what downweights chrome)
    assert(r1.getAs[Long]("n_words") == 15L, r1)
    // 20 page-skeleton tags + 2 inline anchors x 2 tags
    assert(r1.getAs[Long]("n_tags") == 24L, r1)
    // anchor text: "home" + "srcA" + "w5" + "w10" + "about us"
    val anchors1 = "home".length + "srcA".length + "w5".length +
      "w10".length + "about us".length
    assert(r1.getAs[Long]("anchor_chars") == anchors1.toLong, r1)
    val extracted1 = "doc home srcA " + words.mkString(" ") + " about us"
    assert(r1.getAs[Long]("text_chars") == extracted1.length.toLong, r1)
    assert(r1.getAs[Long]("link_density_ppm") ==
      1000000L * anchors1 / extracted1.length, r1)
    assert(r1.getAs[Boolean]("keep"), r1)

    val r2 = out(2L)
    // "doc home srcB a b c d about us" = 9 words; anchors home+srcB+about us
    assert(r2.getAs[Long]("n_words") == 9L, r2)
    val anchors2 = ("home" + "srcB" + "about us").length.toLong
    assert(r2.getAs[Long]("anchor_chars") == anchors2, r2)
    // boilerplate dominates the short doc: density above the threshold
    assert(!r2.getAs[Boolean]("ok_density"), r2)
    assert(!r2.getAs[Boolean]("keep"), r2)
  }

  test("property: html extraction round-trips any tag-free word list") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val gen = for {
      n <- Gen.choose(1, 40)
      ws <- Gen.listOfN(n, word)
      src <- Gen.oneOf("alpha", "beta9", "g")
    } yield (ws, src)
    val samples = (0 until 32).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(4242L + i)))
    val docs = samples.zipWithIndex.map { case ((ws, src), i) =>
      (i.toLong, ws.mkString(" "), "en", src, ws.map(_.length).sum.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.htmlExtractOf(docs, 400000L, 30)
      .collect().map(r => r.getLong(0) -> r).toMap
    samples.zipWithIndex.foreach { case ((ws, src), i) =>
      val r = got(i.toLong)
      // extraction recovers the chrome + the original words, exactly
      val extracted = s"doc home $src " + ws.mkString(" ") + " about us"
      assert(r.getAs[Long]("text_chars") == extracted.length.toLong,
        s"sample $i text_chars")
      assert(r.getAs[Long]("n_words") == (ws.size + 5).toLong,
        s"sample $i n_words")
      val inline = ws.zipWithIndex.collect {
        case (w, j) if (j + 1) % 5 == 0 => w.length }.sum
      val anchors = "home".length + src.length + inline + "about us".length
      assert(r.getAs[Long]("anchor_chars") == anchors.toLong,
        s"sample $i anchors: got ${r.getAs[Long]("anchor_chars")} want $anchors")
      assert(r.getAs[Long]("n_tags") == 20L + 2L * (ws.size / 5),
        s"sample $i tags")
    }
  }

  test("adversarial markup: script/style/comment bodies and quoted '>' never leak (round-13 #2)") {
    import spark.implicits._
    val words = (1 to 20).map(i => s"w$i")
    val docs = Seq((7L, words.mkString(" "), "en", "srcZ", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = TextAnalysis.htmlExtractRows(docs, 400000L, 5)
      .select("html", "extracted").collect()(0)
    val html = row.getString(0)
    val extracted = row.getString(1)
    // the synthesized page really carries every adversarial class
    assert(html.contains("SCRIPTLEAK 7") && html.contains("STYLELEAK") &&
      html.contains("COMMENTLEAK") && html.contains("data-note=\"x>y\""), html)
    // ... and none of it reaches the extracted text
    Seq("SCRIPTLEAK", "STYLELEAK", "COMMENTLEAK", "track", "margin", "x>y",
      "collapsed").foreach(s =>
      assert(!extracted.contains(s), s"leaked '$s' into: $extracted"))
    assert(!extracted.exists(c => c == '<' || c == '>'), extracted)
    // w10 and w20 sit inside the adversarial anchors and extract once each
    assert(extracted == "doc home srcZ " + words.mkString(" ") + " about us",
      extracted)
    // contrast: the naive '<[^>]*>' strip this replaced DOES leak on the
    // same page — the exact failure class the hardening exists for
    val naive = html.replaceAll("<[^>]*>", " ").replaceAll(" +", " ").trim
    assert(naive.contains("SCRIPTLEAK") && naive.contains("COMMENTLEAK"),
      s"naive strip unexpectedly clean: $naive")
  }

  test("extract funnel: per-source rollup consistent with the per-doc table") {
    val perDoc = TextAnalysis.htmlExtract(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val sources = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val funnel = TextAnalysis.extractFunnel(spark, sf).collect()
    assert(funnel.nonEmpty)
    funnel.foreach { f =>
      val src = f.getString(0)
      val docs = perDoc.filter { case (id, _) => sources(id) == src }.values
      assert(f.getAs[Long]("n_docs") == docs.size.toLong, f)
      assert(f.getAs[Long]("n_kept") ==
        docs.count(_.getAs[Boolean]("keep")).toLong, f)
      assert(f.getAs[Long]("anchor_chars") ==
        docs.map(_.getAs[Long]("anchor_chars")).sum, f)
      assert(f.getAs[Long]("kept_ppm") ==
        1000000L * f.getAs[Long]("n_kept") / f.getAs[Long]("n_docs"), f)
    }
  }

  test("html extract: fixture run is all-docs, tags consistent, plan is one projection") {
    val df = TextAnalysis.htmlExtract(spark, sf)
    val rows = df.collect()
    val nDocs = graft.model.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      // 20 constant page-skeleton tags + 2 per inline anchor (words
      // div 5 of the ORIGINAL text; extraction adds 5 chrome words:
      // title "doc", nav home+source, footer "about us")
      val inline = (r.getAs[Long]("n_words") - 5L) / 5L
      assert(r.getAs[Long]("n_tags") == 20L + 2L * inline, r)
      assert(r.getAs[Long]("anchor_chars") <= r.getAs[Long]("text_chars"), r)
      assert(r.getAs[Long]("link_density_ppm") <= 1000000L, r)
    }
  }

  test("confusable fold: restores every plant, catches only fold-level dups") {
    val rows = TextAnalysis.confusableFold(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    // the fold provably inverts every plant class — pinned in band
    assert(rows.map(_.getAs[Long]("n_restored")).sum == nDocs)
    // the planted boilerplate dups are invisible to raw hashing (the
    // zero-width padding scatters them) and ALL caught by the fold —
    // across BOTH plant classes the shared residues land in (7 → zwsp,
    // 11 → nbsp), so this pins cross-class fold agreement, not just
    // per-class invertibility
    val shared = (0 until nDocs.toInt).count(i => i % 25 == 7 || i % 25 == 11)
    assert(rows.map(_.getAs[Long]("n_raw_dup_docs")).sum == 0L)
    assert(rows.map(_.getAs[Long]("n_fold_dup_docs")).sum == shared.toLong)
    assert(rows.map(_.getAs[Long]("n_newly_caught")).sum == shared.toLong)
  }

  test("paragraph trim equals a driver-side recomputation, hash included") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(25).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.paragraphTrim(spark, sf)
      .filter(col("doc_id").isin(docs.keys.toSeq: _*)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      val k = (4 + id % 4).toInt
      val paras = ws.grouped(k).toSeq
      val kept = paras.filter(p =>
        p.length >= 3 && p.count(w => w == "the" || w == "a") >= 1)
      val want = (paras.length.toLong, kept.length.toLong,
        kept.map(_.length.toLong).sum, md5hex(kept.map(_.mkString(" ")).mkString(" ")))
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // the gates are live on the fixture: some paragraphs drop, some stay
    val all = TextAnalysis.paragraphTrim(spark, sf)
      .agg(sum("n_paras"), sum("n_kept")).head
    assert(all.getLong(1) > 0 && all.getLong(1) < all.getLong(0))
  }

  test("the fold table inverts each planted confusable class exactly") {
    import spark.implicits._
    // a controlled corpus hitting every class incl. the curly-quote and
    // em-dash fold entries the fixture plant never exercises
    val docs = Seq(
      (0L, "s", "plain text stays"),
      (1L, "s", "nbsp spaced words"),
      (2L, "s", "zwsp after spaces"),
      (3L, "s", "leading zwsp doc"),
      (4L, "s", "fullwidth abc here"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.confusableFoldOf(docs).collect()
    assert(r.map(_.getAs[Long]("n_restored")).sum == 5L,
      "every class must fold back to its canonical text")
  }
}
