package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * AQE skew-join splitting: the runtime complement of the deterministic
 * salted join (q87). The salted rewrite is for keys KNOWN to be hot;
 * for skew discovered only at runtime, AQE's `OptimizeSkewedJoin`
 * splits oversized shuffle partitions into parallel sub-reads — at
 * 100 TB this is the difference between one straggler task owning a
 * hot key's whole partition and n tasks sharing it. This spec pins the
 * behavior (plan marked `isSkew=true`, result unchanged) so the
 * engine's skew story is mechanically covered end to end: salting for
 * known hot keys, AQE splitting for discovered ones.
 */
class AqeSkewJoinSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // local checksum of the join output (order-independent): row count,
  // sum(v), sum(w)
  private def checksum(rows: Array[org.apache.spark.sql.Row]): (Long, Long, Long) =
    (rows.length.toLong,
      rows.map(_.getLong(1)).sum,
      rows.map(_.getLong(2)).sum)

  test("AQE splits a runtime-skewed sort-merge join, result unchanged") {
    // one pathological key owning ~all fact rows, against a uniform side.
    // NOTE: a join-key aggregation above the join would veto the split
    // (it would break the required distribution), so the probe is the
    // bare join — exactly the stage the straggler would own
    val fact = spark.range(0, 60000)
      .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id") % 50)
        .as("k"), col("id").as("v"))
    val dim = spark.range(0, 50).select(col("id").as("k"), (col("id") * 10).as("w"))
    val q = () => fact.join(dim, "k").select(col("k"), col("v"), col("w"))

    val plain = checksum(q().collect())

    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds sized to the fixture so the hot key trips them
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = q()
      val got = checksum(df.collect()) // execute THIS df: its final
      // adaptive plan is what the assertion below renders
      val rendered = df.queryExecution.executedPlan.toString
      assert(rendered.contains("isSkew=true") || rendered.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$rendered")
      assert(got == plain, s"skew-split changed the result: $got vs $plain")
    }
  }
}
