package graft.ops

import graft.SparkSpec

class FormatsSpec extends SparkSpec {

  test("format round-trip: every format's checksums equal the parquet control") {
    val rows = Formats.formatRoundtrip(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Formats.RoundtripFormats.sorted)
    // all four rows identical except the format label
    val bodies = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).distinct
    assert(bodies.length == 1,
      s"a format lost/re-typed rows on its write->read loop: ${rows.mkString("; ")}")
    // and the control row matches the source of truth directly
    val li = graft.model.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") % 10 === 0)
    assert(bodies.head._1 == li.count())
    assert(bodies.head._2 ==
      li.agg(org.apache.spark.sql.functions.sum("l_orderkey"))
        .head.getLong(0))
  }
}
