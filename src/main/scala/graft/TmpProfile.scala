package graft

import graft.llm.Dedup
import graft.model.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library). */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val sh = Dedup.shingles(docs)
    time("shingles.count")(sh.count())
    time("shingles.count2")(sh.count())
    val salts = (0 until 8).map(lit(_))
    val exploded = sh.withColumn("salt", explode(array(salts: _*)))
    time("exploded.count")(exploded.count())
    val md5d = exploded.withColumn("h", md5(concat(col("salt").cast("string"), lit("|"), col("s"))))
    time("md5.agg")(md5d.agg(max("h")).collect())
    val mh = md5d.groupBy(col("doc_id"), col("salt")).agg(min("h").as("h"))
    time("minhash.count")(mh.count())
    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("full again")(Dedup.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
