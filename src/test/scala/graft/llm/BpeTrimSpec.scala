package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q213 (exact-substring trim), q214 (BPE merges), q215 (KN
  * continuation) behavior pins. */
class BpeTrimSpec extends SparkSpec {

  import spark.implicits._

  test("dup span trim: echo is cut, canonical survives, disjoint docs untouched") {
    // in-memory frames bypass the ModelCache (key discipline: only
    // file-backed corpora cache), so this plants fresh every run
    val docs = Seq(
      // docs 1 and 2 share a 9-token span => 3 shared 7-grams covering
      // 9 positions; doc 1 is the lowest-id holder and keeps them
      (1L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 tail1 tail2"),
      (2L, "head1 head2 s1 s2 s3 s4 s5 s6 s7 s8 s9"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.dupSpanTrimOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // canonical holder unchanged
    assert(rows(1L).getLong(2) == 0L)
    assert(rows(1L).getString(3) ==
      "s1 s2 s3 s4 s5 s6 s7 s8 s9 tail1 tail2")
    // echo: the 9 shared positions removed, rest kept in order
    assert(rows(2L).getLong(2) == 9L)
    assert(rows(2L).getString(3) == "head1 head2")
    // no cross-doc grams => untouched
    assert(rows(3L).getLong(2) == 0L)
    assert(rows(3L).getString(3) == "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
  }

  test("dup span trim: fixture run is deterministic and token-consistent") {
    val df = TextAnalysis.dupSpanTrim(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rem, txt) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(rem >= 0 && rem <= n)
      val kept = if (txt.isEmpty) 0 else txt.split(" ").length
      assert(kept == n - rem, s"doc ${r.getLong(0)}: $kept kept vs $n-$rem")
    }
  }

  test("bpe merges: greedy self-pair-free merge learning is exact on a toy corpus") {
    // words: "ab" x3, "abc" x2, "bc" x1 =>
    // pair counts: (a,b)=5, (b,c)=3 => merge 1 = (a,b)
    // after: [ab] x3, [ab,c] x2, [b,c] x1 => (ab,c)=2, (b,c)=1 => merge 2 = (ab,c)
    val docs = Seq(
      (1L, "ab ab abc"),
      (2L, "ab abc bc")
    ).toDF("doc_id", "text")
    val m = Bpe.bpeMergesOf(docs, 2).collect()
    assert(m.length == 2)
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) == ("a", "b", 5L))
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(4)) == ("ab", "c", 2L))
    // symbol totals shrink by the applied pair count each step:
    // start 2+2+3+3+2+2 = wait — weighted: ab(wc3,2sym)+abc(wc2,3sym)+bc(wc1,2sym)=14
    // after merge1: ab(1)+abc(2)+bc(2) weighted 3+4+2 = 9 = 14-5
    assert(m(0).getLong(5) == 9L)
    assert(m(1).getLong(5) == 7L) // 9 - 2
  }

  test("bpe merges: symbols with backslashes and quotes never re-enter a SQL parser") {
    // regression: applyMerge once interpolated learned symbols into
    // expr() strings escaping only single quotes — a backslash symbol
    // (Spark SQL treats \ as a string-literal escape) changed match
    // semantics on the Spark side only. Symbols now travel as lit()
    // values. Corpus: "a'b" x2, "a\b" x3 => top pair tie at 3 between
    // (a,\) and (\,b); lexicographic tiebreak picks pa="\" (0x5C < 'a')
    val docs = Seq(
      (1L, "a'b a\\b a\\b"),
      (2L, "a'b a\\b")
    ).toDF("doc_id", "text")
    val m = Bpe.bpeMergesOf(docs, 2).collect()
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) == ("\\", "b", 3L))
    assert(m(0).getLong(5) == 12L) // 15 total symbols - 3 applied merges
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(4)) == ("a", "\\b", 3L))
    assert(m(1).getLong(5) == 9L)
  }

  test("bpe batched merges: j=1 reproduces the sequential algorithm exactly") {
    val docs = Seq(
      (1L, "ab ab abc"),
      (2L, "ab abc bc")
    ).toDF("doc_id", "text")
    val sequential = Bpe.learnMerges(docs, 2)
    val batched = Bpe.learnMergesBatched(docs, 2, 1).flatten
    assert(batched == sequential)
  }

  test("bpe batched merges: symbol-disjoint top pairs land in one iteration") {
    // "ab" x3, "cd" x2: (a,b)=3 and (c,d)=2 share no symbol => both
    // merge in a single batch; totals account exactly (10 - 3 - 2 = 5)
    val docs = Seq(
      (1L, "ab ab cd"),
      (2L, "ab cd")
    ).toDF("doc_id", "text")
    val batches = Bpe.learnMergesBatched(docs, 1, 2)
    assert(batches.length == 1)
    assert(batches.head.map(m => (m.pa, m.pb, m.n)) ==
      Seq(("a", "b", 3L), ("c", "d", 2L)))
    assert(batches.head.map(_.symbolsAfter).distinct == Seq(5L))
    // overlapping head: (a,b)=3 and (b,c)=2 share b => greedy keeps
    // only the top pair; the blocked pair merges NEXT iteration
    val docs2 = Seq(
      (1L, "ab ab bc"),
      (2L, "ab bc")
    ).toDF("doc_id", "text")
    val b2 = Bpe.learnMergesBatched(docs2, 2, 2)
    assert(b2.head.map(m => (m.pa, m.pb)) == Seq(("a", "b")))
    assert(b2(1).map(m => (m.pa, m.pb)) == Seq(("b", "c")))
  }

  test("bpe merges: fixture merges are well-formed and counts decrease") {
    val m = Bpe.bpeMerges(spark, sf).collect()
    assert(m.length == 3)
    assert(m.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    m.foreach { r =>
      assert(r.getString(1) != r.getString(2) || r.getString(1).length > 1,
        "halves of rank-1 merges are distinct single symbols")
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // later merges never outrank earlier ones at selection time is not
    // guaranteed (counts recompute), but symbol totals strictly fall
    assert(m.map(_.getLong(5)).toSeq == m.map(_.getLong(5)).toSeq.sorted.reverse)
  }

  test("bpe apply: compression consistent with the merge ledger") {
    val rows = Bpe.bpeApply(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (before, after, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(after <= before, s"merges can only shrink: $r")
      assert(ppm == 1000000L * after / before)
    }
    // per-source afters sum to the ledger's final corpus total
    val ledger = Bpe.bpeMerges(spark, sf).collect()
    assert(rows.map(_.getLong(3)).sum == ledger.last.getLong(5),
      "per-source symbol totals must sum to the last merge's corpus total")
  }

  test("ann mrr: bounded by hits, consistent with the recall family") {
    val r = Similarity.annMrr(spark, sf).collect().head
    val (nq, nHit, nHit1, mrr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nq > 0 && nHit <= nq && nHit1 <= nHit)
    assert(mrr >= 0L && mrr <= 1000000L)
    // every rank-1 hit contributes a full micro-unit, so the mean is
    // at least the rank-1 mass and at most the any-hit mass
    assert(mrr <= 1000000L * nHit / nq)
    assert(mrr >= 1000000L * nHit1 / nq - 1)
  }

  test("kn continuation: ppm exact, bounds hold, the artifact serves it") {
    val rows = MixPlan.knContinuation(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // descending continuation contexts with word tiebreak
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0)))
    }
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(3) >= r.getLong(1),
        "occurrences as continuation >= distinct left contexts")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
    }
  }

  test("wordpiece: greedy longest-match ladder, unk fallback, hand-checked words") {
    // hand-tokenized against WpVocab (longest-first, 1-char fallback):
    //  "nation"  -> na? no; "nati" no, "nat" no, "na" no, "n"; then
    //               "atio" no, "ate"? w="nation": n|ation: "atio" no,
    //               "ati" no, "at" yes -> n|at|ion ("ion" in vocab)
    //  "the"     -> "the" (one piece, 3-char tier)
    //  "X-ray"   -> 'X' unk, '-' unk, "ray": "ra" no, 'r','a','y' ...
    val docs = Seq(
      (1L, "nation the", "en", "s1", 10L),
      (2L, "X-ray", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Bpe.wordpieceTokensOf(docs).collect()
    assert(r.length == 1)
    val row = r.head
    // nation = n|at|ion (3), the = the (1), X-ray = X|-|r|a|y (5)
    assert(row.getAs[Long]("n_words") == 3L)
    assert(row.getAs[Long]("n_pieces") == 3L + 1L + 5L, row)
    // exactly the two non-vocab characters fall back to unk
    assert(row.getAs[Long]("n_unk") == 2L, row)
    assert(row.getAs[Long]("fertility_ppm") == 1000000L * 9L / 3L)
  }

  test("wordpiece: every piece count is >= ceil(len/4) and <= len; fixture runs clean") {
    // per-word bounds: a piece consumes between 1 and WpMaxLen chars
    val docs = graft.model.Tables.documents(spark, sf)
    val out = Bpe.wordpieceTokens(spark, sf).collect()
    assert(out.nonEmpty)
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(count(lit(1)), sum(length(col("w"))),
        sum(ceil(length(col("w")) / lit(Bpe.WpMaxLen.toDouble))).cast("long"))
      .head
    val (nWords, nChars, minPieces) =
      (words.getLong(0), words.getLong(1), words.getLong(2))
    val totPieces = out.map(_.getAs[Long]("n_pieces")).sum
    assert(out.map(_.getAs[Long]("n_words")).sum == nWords)
    assert(totPieces >= minPieces && totPieces <= nChars,
      s"pieces $totPieces outside [$minPieces, $nChars]")
  }

  test("viterbi: finds the optimum greedy misses; unk fallback priced exactly") {
    val costs = Seq("ab" -> 10L, "abc" -> 50L, "cd" -> 10L,
      "a" -> 30L, "b" -> 30L, "c" -> 30L, "d" -> 30L)
    def run(text: String) = Bpe.viterbiTokensOf(
      Seq((1L, text, "en", "s1", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      costs, 300L).collect().head
    // "abcd": greedy longest-first takes abc|d = 50 + 30 = 80; the
    // optimum is ab|cd = 10 + 10 = 20 — the case that motivates exact
    // Viterbi over the q246 ladder
    val r = run("abcd")
    assert(r.getAs[Long]("total_cost") == 20L, r)
    assert(r.getAs[Long]("n_pieces") == 2L, r)
    // vocab-free characters pay exactly unkCost each
    val r2 = run("XY")
    assert(r2.getAs[Long]("total_cost") == 600L && r2.getAs[Long]("n_pieces") == 2L, r2)
    // two words aggregate independently
    val r3 = run("abcd abcd")
    assert(r3.getAs[Long]("total_cost") == 40L && r3.getAs[Long]("n_words") == 2L, r3)
  }

  test("viterbi: a >=1000-piece word decodes cleanly (radix 1e7)") {
    // ADVICE r12: radix 1000 corrupted both packed fields on any
    // unbroken token >= 1000 chars (base64/URL strings) — the piece
    // count overflowed into the cost digits. 1200 'z's segment into
    // 1200 one-char pieces at cost 48 each.
    val word = "z" * 1200
    val r = Bpe.viterbiTokensOf(
      Seq((1L, word, "en", "s1", word.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      Bpe.vitCostSeq, Bpe.VitUnkCost).collect().head
    assert(r.getAs[Long]("n_pieces") == 1200L, r)
    assert(r.getAs[Long]("total_cost") == 48L * 1200L, r)
  }

  test("learned wordpiece == literal wordpiece on a corpus whose vocabs coincide") {
    // round-13 verdict #2: the learning→inference loop. Corpus
    // "the the the thx": merge 1 = (t,h) count 4, merge 2 = (th,e)
    // count 3, so the learned vocab (alphabet + {th, the}) agrees with
    // the frozen WpVocab on every substring this corpus contains — the
    // two greedy ladders must emit identical rows.
    val docs = Seq((1L, "the the the thx", "en", "s1", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val learned = Bpe.learnedVocab(docs, 2)
    assert(learned.toSet ==
      (Bpe.BaseAlphabet ++ Seq("th", "the")).toSet, learned)
    val lit = Bpe.wordpieceTokensOf(docs).collect().map(_.toSeq)
    val der = Bpe.wordpieceTokensOf(docs, learned, Bpe.LearnedMaxLen)
      .collect().map(_.toSeq)
    assert(lit.toSeq == der.toSeq, s"literal $lit vs learned $der")
    // and the learned ladder serves through the public entry shape
    val viaEntry = Bpe.wordpieceTokensOf(docs, learned, Bpe.LearnedMaxLen)
      .collect().head
    assert(viaEntry.getAs[Long]("n_unk") == 0L)
  }

  test("learned viterbi: costs derived from stored counts, DP optimum brute-checked") {
    val docs = Seq((1L, "the the the thx", "en", "s1", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val costs = Bpe.learnedCostSeq(docs, 2).toMap
    // th: count 4 -> bitlen 3 -> 96 - 48 = 48; the: count 3 -> bitlen 2
    // -> 144 - 32 = 112; a merged piece is cheaper than spelling it out
    assert(costs("th") == 48L && costs("the") == 112L, costs)
    assert(costs("th") < costs("t") + costs("h"))
    // optimum per word: "the" -> th|e = 96 (beats the 1-piece 112 and
    // the spelled 144); "thx" -> th|x = 96
    val r = Bpe.viterbiTokensOf(docs, Bpe.learnedCostSeq(docs, 2),
      Bpe.VitUnkCost, Bpe.LearnedMaxLen).collect().head
    assert(r.getAs[Long]("n_words") == 4L, r)
    assert(r.getAs[Long]("total_cost") == 4L * 96L, r)
    assert(r.getAs[Long]("n_pieces") == 8L, r)
  }

  test("learned ladder width follows the vocab: an 8-char m=4 piece is reachable") {
    // self-pair-free merges compound Fibonacci-style; on "abcababc"
    // m=4 learns ab, abc, ababc (tie ab<abc), then abc+ababc =
    // "abcababc" — 8 chars, beyond the oracle's static m=3 width.
    // The Scala path must derive its ladder from the vocab and consume
    // the whole word as ONE piece (a fixed 6-wide ladder split it 2).
    val docs = Seq((1L, Seq.fill(10)("abcababc").mkString(" "), "en", "s1", 89L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val vocab = Bpe.learnedVocab(docs, 4)
    assert(vocab.contains("abcababc"), vocab.filter(_.length > 1))
    val r = Bpe.wordpieceTokensOf(docs, vocab,
      vocab.map(_.length).max).collect().head
    assert(r.getAs[Long]("n_words") == 10L, r)
    assert(r.getAs[Long]("n_pieces") == 10L,
      s"8-char learned piece not consumed whole: $r")
    // Viterbi under the derived costs: ab=16 (n=30), abc=64 (n=20),
    // ababc=176 (n=10), abcababc=320 (n=10), chars=48. The optimum for
    // "abcababc" is abc|ab|abc = 64+16+64 = 144 (the 5-piece
    // ab|c|ab|ab|c ties on cost and loses the fewest-pieces tiebreak;
    // the 1-piece 320 and 2-piece 240 lose outright) — exact DP pin.
    val viaCosts = Bpe.learnedCostSeq(docs, 4)
    val v = Bpe.viterbiTokensOf(docs, viaCosts, Bpe.VitUnkCost,
      viaCosts.map(_._1.length).max).collect().head
    assert(v.getAs[Long]("total_cost") == 1440L, v)
    assert(v.getAs[Long]("n_pieces") == 30L, v)
  }

  test("learned tokenizers serve from the memoized artifact on the fixture") {
    // both run green at fixture scale and their piece counts respect
    // the same per-word bounds as the frozen-table paths
    Seq(Bpe.wordpieceTokensLearned(spark, sf),
        Bpe.viterbiTokensLearned(spark, sf)).foreach { df =>
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"), r)
        assert(r.getAs[Long]("fertility_ppm") ==
          1000000L * r.getAs[Long]("n_pieces") / r.getAs[Long]("n_words"))
      }
    }
    // exact Viterbi can never pay MORE pieces-weighted cost than any
    // other segmentation under the SAME cost table — compare against
    // the greedy ladder re-costed: fertility of viterbi <= greedy's
    // (both under the learned vocab, cost-optimal implies it here
    // because every piece costs >= 1)
    val greedy = Bpe.wordpieceTokensLearned(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_pieces")).toMap
    Bpe.viterbiTokensLearned(spark, sf).collect().foreach { r =>
      val lang = r.getString(0)
      assert(r.getAs[Long]("total_cost") <=
        greedy(lang) * 48L * Bpe.LearnedMaxLen,
        s"viterbi cost not bounded by greedy spelling for $lang")
    }
  }

  test("viterbi: fixture costs and piece counts sit inside the per-piece bounds") {
    val out = Bpe.viterbiTokens(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (pieces, cost) = (r.getAs[Long]("n_pieces"), r.getAs[Long]("total_cost"))
      // every piece costs between the cheapest (12, a 4-char hit) and
      // the unk fallback (300)
      assert(cost >= 12L * pieces && cost <= 300L * pieces, r)
      assert(r.getAs[Long]("fertility_ppm") ==
        1000000L * pieces / r.getAs[Long]("n_words"))
    }
  }
}
