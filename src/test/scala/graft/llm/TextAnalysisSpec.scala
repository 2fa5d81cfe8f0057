package graft.llm

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

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
}
