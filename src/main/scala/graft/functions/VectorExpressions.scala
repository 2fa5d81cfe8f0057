package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Codegen'd sequential-double dot product over two `ArrayType(FloatType)`
 * columns.
 *
 * Numerically identical to
 * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, (s,v) -> s+v)`
 * — each float widens to double before the multiply and the partial sums
 * accumulate left-to-right — but runs as a tight generated loop inside
 * whole-stage codegen instead of an interpreted per-element lambda with
 * an intermediate array. On the sf0.1 all-pairs similarity scan this is
 * the difference between the HOF pipeline (~23 s) and ~2 s.
 *
 * The bit-exact fold order is load-bearing: the DuckDB oracles replay
 * the same sequential fold (`list_sum(list_transform(...))`), so even
 * raw similarity doubles hash-match.
 */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(FloatType); internal-only expression, so no
  // analyzer-facing type-coercion surface
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd sequential dot product of an `ArrayType(FloatType)` column
 * (left) against an `ArrayType(DoubleType)` column (right).
 *
 * Exists for the k-means distance kernel: after the first Lloyd's
 * update, centroids are exact doubles (decimal-summed means), and
 * casting them back to float before the dot product would throw away
 * the very determinism the decimal sums bought. Same fold contract as
 * [[DotProductD]]: left element widens float→double, partial sums
 * accumulate left-to-right — mirrored by the DuckDB oracle's
 * `list_sum(list_transform(range(...), i -> v[i]::DOUBLE * c[i]))`.
 */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product_fd"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProductD]]. */
  def dot_d(a: Column, b: Column): Column =
    GraftShims.column(DotProductD(GraftShims.expression(a), GraftShims.expression(b)))

  /** Column API for [[DotProductFD]] (float array · double array). */
  def dot_fd(a: Column, b: Column): Column =
    GraftShims.column(DotProductFD(GraftShims.expression(a), GraftShims.expression(b)))
}
