package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/**
 * Mergeable quantile sketch (KLL-style compactor hierarchy, Karnin,
 * Lang & Liberty 2016) as a `TypedImperativeAggregate`: level `h`
 * holds items of weight `2^h`; a full level sorts and promotes the
 * odd-indexed half, doubling its weight.
 *
 * Two deliberate deviations from the paper, both for the oracle
 * discipline:
 *  - compaction keeps the odd 0-based indices ALWAYS (the paper flips
 *    a coin): the sketch's rank function then only ever UNDERcounts,
 *    by at most `2^h` per compaction — a one-sided, exactly-tracked
 *    error (`errBound` accumulates the discarded weight);
 *  - every level keeps capacity `k` (the paper shrinks low levels):
 *    simpler, and the memory is still k·log₂(n/k) items per group.
 *
 * Guarantee used by the query gate: for any threshold q, sketch rank
 * R(q) satisfies `true_rank(q) − errBound ≤ R(q) ≤ true_rank(q)`, for
 * ANY insertion/merge order. The estimate picked at cumulative weight
 * ≥ t therefore has `count(v ≤ est) ≥ t` and
 * `count(v < est) < t + errBound` — the two booleans
 * [[graft.ops.Sketches.kllQuantiles]] emits (layout-independent, so
 * the oracle pins them TRUE; the estimates themselves are
 * layout-dependent and are NOT emitted, the q102 discipline).
 *
 * Scale: the buffer is O(k·log n) doubles per group and merges
 * pointwise — the mergeable-summary shape that computes quantiles
 * over 10^12 rows in one partial-aggregation pass, where exact
 * `percentile` must materialize every value per group.
 */
case class KllQuantileAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantileAgg.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = KllQuantileAgg.outType
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllQuantileAgg.Buffer =
    new KllQuantileAgg.Buffer(ArrayBuffer(ArrayBuffer.empty[Double]), 0L, 0L)

  override def update(b: KllQuantileAgg.Buffer, input: InternalRow): KllQuantileAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      b.levels(0) += v.asInstanceOf[Double]
      b.n += 1L
      KllQuantileAgg.compact(b, k)
    }
    b
  }

  override def merge(b: KllQuantileAgg.Buffer, o: KllQuantileAgg.Buffer): KllQuantileAgg.Buffer = {
    while (b.levels.length < o.levels.length) b.levels += ArrayBuffer.empty[Double]
    var h = 0
    while (h < o.levels.length) { b.levels(h) ++= o.levels(h); h += 1 }
    b.n += o.n
    b.errBound += o.errBound
    KllQuantileAgg.compact(b, k)
    b
  }

  override def eval(b: KllQuantileAgg.Buffer): Any = {
    if (b.n == 0L) return null
    // flatten to (value, weight), sort by value, walk cumulative weight
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < b.levels.length) {
      val w = 1L << h
      b.levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val maxW = 1L << (b.levels.length - 1)
    def estimate(t: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= t) return sorted(i)._1
        i += 1
      }
      sorted.last._1 // total weight == n >= t, so unreachable
    }
    val t25 = (b.n + 3L) / 4L
    val t50 = (b.n + 1L) / 2L
    val t75 = (3L * b.n + 3L) / 4L
    new GenericInternalRow(Array[Any](
      b.n, b.errBound + maxW, estimate(t25), estimate(t50), estimate(t75)))
  }

  override def serialize(b: KllQuantileAgg.Buffer): Array[Byte] = {
    val total = b.levels.map(_.length).sum
    val buf = ByteBuffer.allocate(8 + 8 + 4 + b.levels.length * 4 + total * 8)
    buf.putLong(b.n).putLong(b.errBound).putInt(b.levels.length)
    b.levels.foreach { lvl =>
      buf.putInt(lvl.length)
      lvl.foreach(buf.putDouble)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KllQuantileAgg.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong()
    val err = buf.getLong()
    val nLevels = buf.getInt()
    val levels = ArrayBuffer.fill(nLevels) {
      val sz = buf.getInt()
      ArrayBuffer.fill(sz)(buf.getDouble())
    }
    new KllQuantileAgg.Buffer(levels, n, err)
  }

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KllQuantileAgg {
  final class Buffer(
      var levels: ArrayBuffer[ArrayBuffer[Double]],
      var n: Long,
      var errBound: Long)

  val outType: StructType = StructType(Seq(
    StructField("n", LongType),
    StructField("slack", LongType),
    StructField("est25", DoubleType),
    StructField("est50", DoubleType),
    StructField("est75", DoubleType)))

  /** Compact every over-full level bottom-up: sort, promote the odd
    * 0-based half at doubled weight, book the discarded weight into
    * the error bound. Leaves one item behind when the level is odd. */
  private[functions] def compact(b: Buffer, k: Int): Unit = {
    var h = 0
    while (h < b.levels.length) {
      while (b.levels(h).length >= k) {
        val sortedLvl = b.levels(h).sorted
        val m = sortedLvl.length - (sortedLvl.length % 2)
        val promoted = ArrayBuffer.empty[Double]
        var i = 1
        while (i < m) { promoted += sortedLvl(i); i += 2 }
        val remainder =
          if (m < sortedLvl.length) ArrayBuffer(sortedLvl.last)
          else ArrayBuffer.empty[Double]
        b.levels(h) = remainder
        if (h + 1 >= b.levels.length) b.levels += ArrayBuffer.empty[Double]
        b.levels(h + 1) ++= promoted
        b.errBound += 1L << h
      }
      h += 1
    }
  }

  /** Column API: (n, slack, est25, est50, est75) struct per group. */
  def kll_quantiles(c: Column): Column =
    GraftShims.column(KllQuantileAgg(GraftShims.expression(c)).toAggregateExpression())
}
