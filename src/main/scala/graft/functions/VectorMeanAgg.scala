package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Element-wise mean of an `ArrayType(FloatType)` column (vector
 * centroid) as a `TypedImperativeAggregate` with a primitive
 * (sums: Array[Double], count: Long) buffer.
 *
 * Why custom (SURVEY.md §4 preference (b)): the built-in composition —
 * `posexplode` + groupBy(dim) + avg — multiplies the shuffled row count
 * by the vector dimension (64×) and loses the row's contiguity. This
 * aggregate ships one 520-byte buffer per group per partition: the
 * partial-aggregation shape you want for computing k-means / IVF
 * centroids over 10^9 embeddings.
 *
 * Not oracle-checked: cross-partition double addition is
 * order-dependent by nature; the spec compares against the built-in
 * composition with an epsilon instead.
 */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "vector_mean"

  override def createAggregationBuffer(): VectorMeanAgg.Buffer =
    new VectorMeanAgg.Buffer(null, 0L)

  override def update(b: VectorMeanAgg.Buffer, input: InternalRow): VectorMeanAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      val m = math.min(n, b.sums.length)
      var i = 0
      while (i < m) { b.sums(i) += arr.getFloat(i).toDouble; i += 1 }
      b.count += 1
    }
    b
  }

  override def merge(b: VectorMeanAgg.Buffer, o: VectorMeanAgg.Buffer): VectorMeanAgg.Buffer = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums.clone(); b.count = o.count }
      else {
        val m = math.min(b.sums.length, o.sums.length)
        var i = 0
        while (i < m) { b.sums(i) += o.sums(i); i += 1 }
        b.count += o.count
      }
    }
    b
  }

  override def eval(b: VectorMeanAgg.Buffer): Any =
    if (b.sums == null || b.count == 0L) null
    else new GenericArrayData(b.sums.map(_ / b.count))

  override def serialize(b: VectorMeanAgg.Buffer): Array[Byte] = {
    val n = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * n)
    buf.putLong(b.count).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanAgg.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val count = buf.getLong()
    val n = buf.getInt()
    val sums = if (n == 0) null else Array.fill(n)(buf.getDouble())
    new VectorMeanAgg.Buffer(sums, count)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object VectorMeanAgg {
  final class Buffer(var sums: Array[Double], var count: Long)

  /** Column API: element-wise mean of a float-array column. */
  def vector_mean(c: Column): Column =
    GraftShims.column(VectorMeanAgg(GraftShims.expression(c)).toAggregateExpression())
}
