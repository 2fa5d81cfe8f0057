package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-fingerprint gate only works if the normalization strips
  * EXACTLY the run-dependent noise: too little and every JVM restart
  * "changes" every plan (the gate can never pass); too much and a real
  * operator change hashes identically (the gate never fires). */
class PlanShapesSpec extends AnyFunSuite {

  test("run-dependent noise normalizes away") {
    val a = """*(2) HashAggregate(keys=[l_returnflag#41], functions=[sum(l_quantity#45)])
      |+- Exchange hashpartitioning(l_returnflag#41, 32), [id=#123]
      |   +- MapPartitions graft.ops.GlobalOrder$$$Lambda$4123/0x00007f400119f5e8@1a2b3c4d, obj#99: org.apache.spark.sql.Row
      |      +- FileScan parquet [x#26L] Location: InMemoryFileIndex(1 paths)[file:/tmp/laydbg123/hilbert]""".stripMargin
    val b = """*(2) HashAggregate(keys=[l_returnflag#7], functions=[sum(l_quantity#9)])
      |+- Exchange hashpartitioning(l_returnflag#7, 32), [id=#456]
      |   +- MapPartitions graft.ops.GlobalOrder$$$Lambda$77/0x00001b400119aaaa@ffee2211, obj#3: org.apache.spark.sql.Row
      |      +- FileScan parquet [x#11L] Location: InMemoryFileIndex(1 paths)[file:/tmp/laydbg999/hilbert]""".stripMargin
    assert(PlanShapes.fingerprint(a) == PlanShapes.fingerprint(b))
  }

  test("absolute paths outside known roots normalize too (tmpdir-independent)") {
    // a macOS-style tmpdir has no testdata/tmp/warehouse segment — the
    // q255/q256 scratch roots must still fingerprint host-independently
    val a = "FileScan csv [key#1L] Location: InMemoryFileIndex(1 paths)" +
      "[/var/folders/x9/T/graft-format-roundtrip123/str_csv]"
    val b = "FileScan csv [key#7L] Location: InMemoryFileIndex(1 paths)" +
      "[/private/scratch/graft-format-roundtrip999/str_csv]"
    assert(PlanShapes.fingerprint(a) == PlanShapes.fingerprint(b))
  }

  test("a real operator change survives normalization") {
    val smj = "SortMergeJoin [a#1], [b#2], Inner"
    val bhj = "BroadcastHashJoin [a#1], [b#2], Inner, BuildRight"
    assert(PlanShapes.fingerprint(smj) != PlanShapes.fingerprint(bhj))
    // and so does an added exchange
    val one = "Exchange hashpartitioning(a#1, 32)\n+- Scan x"
    val two = "Exchange hashpartitioning(a#1, 32)\n+- Exchange rangepartitioning(a#1, 32)\n   +- Scan x"
    assert(PlanShapes.fingerprint(one) != PlanShapes.fingerprint(two))
  }

  test("stored baseline covers every query key") {
    val stored = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/plan_shapes.json")), "UTF-8")
    val keys = "\"(q\\d+_[a-z0-9_]+)\"".r
      .findAllMatchIn(stored).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- keys
    assert(missing.isEmpty,
      s"tools/plan_shapes.json is missing fingerprints for: " +
        s"${missing.toSeq.sorted.mkString(", ")} — rerun graft.PlanShapes")
  }
}
