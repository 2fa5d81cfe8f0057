package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Pins the two halves of the fuzzy-join blocking contract separately:
 *
 *  - PERFORMANCE: [[Relational4.signatureTable]] must select each
 *    name's RAREST grams (gfreq ascending). Any consistent total order
 *    is lossless, so the equality tests alone cannot catch an inverted
 *    order — but a descending order makes the hottest grams the
 *    blocking keys and re-admits the quadratic candidate growth the
 *    prefix filter exists to eliminate. The hot-gram test fails
 *    loudly if the order ever flips again.
 *
 *  - CORRECTNESS: property-based losslessness — ScalaCheck-generated
 *    name multisets (varying alphabet size so grams repeat, lengths
 *    straddling the `longMin = maxDist·q + q` short/long boundary,
 *    duplicate-heavy corpora) must produce exactly the naive
 *    block-join's pair set for maxDist ∈ {0,1,2,3}. Exercises the
 *    lemma's edge cases: occ-encoding of repeated grams and the
 *    degenerate-short arm boundary.
 */
class SignatureRarestGramSpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1204L + i)))

  test("signatures hold the RAREST grams: a hot shared gram never enters them") {
    val sqlCtx = spark
    import sqlCtx.implicits._
    // every name carries the hot gram "zz" plus globally-unique grams;
    // with maxDist=1 (sigLen = 3) the three rarest grams of each name
    // are all unique ones, so "zz" must appear in NO signature
    val letters = "abcdefghijklmnopqrstuvwxy" // 'z' reserved for the hot gram
    val parts = (0 until 8).map { i =>
      val u = letters.slice(i * 3, i * 3 + 3) // 3 unique letters per name
      ((i + 1).toLong, "Brand#1", 1, s"zz${u(0)}${u(1)}${u(2)}${u(0)}")
    }.toDF("p_partkey", "p_brand", "p_size", "p_name")
    val sig = Relational4.signatureTable(parts, maxDist = 1).cache()
    // each name keeps exactly sigLen = 3 elements…
    val perKey = sig.groupBy("p_partkey").agg(count(lit(1)).as("n"))
    assert(perKey.filter(col("n") =!= 3).count() == 0)
    // …and the hot gram is in none of them
    val hot = sig.filter(col("gram") === "zz")
    assert(hot.count() == 0,
      "hot gram 'zz' entered a signature — rarest-gram order inverted")
    sig.unpersist()
  }

  test("property: prefix-filtered fuzzy join == naive block join on random corpora") {
    val sqlCtx = spark
    import sqlCtx.implicits._
    val corpusGen = for {
      alphaSize <- Gen.choose(2, 5) // small alphabet → repeated grams, duplicates
      n <- Gen.choose(6, 28)
      names <- Gen.listOfN(n, for {
        // lengths 0..9 straddle longMin = 2d+2 ∈ {2,4,6,8} for d ∈ 0..3
        len <- Gen.choose(0, 9)
        cs <- Gen.listOfN(len, Gen.choose(0, alphaSize - 1).map(i => ('a' + i).toChar))
      } yield cs.mkString)
    } yield names
    samples(corpusGen, 6).zipWithIndex.foreach { case (names, si) =>
      val parts = names.zipWithIndex.map { case (nm, i) =>
        ((i + 1).toLong, "Brand#1", 1, nm)
      }.toDF("p_partkey", "p_brand", "p_size", "p_name")
      val naive = parts.as("a").join(parts.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_size") === col("b.p_size") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
        .select(col("a.p_brand").as("p_brand"),
          col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          col("dist").cast("long").as("dist"))
      for (d <- 0 to 3) {
        val got = Relational4.fuzzyJoinOf(parts, d)
          .collect().map(_.toSeq).sortBy(_.toString)
        val want = naive.filter(col("dist") <= d)
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(got.toSeq == want.toSeq,
          s"sample=$si maxDist=$d corpus=${names.take(12).mkString(",")}…")
      }
    }
  }
}
