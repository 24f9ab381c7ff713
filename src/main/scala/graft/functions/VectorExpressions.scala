package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding math (SURVEY.md §7.5).
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates a lambda frame per element; at 100 TB (billions of rows × 64+
  * dims) that is the hot loop, so these run as tight primitive loops over
  * Spark's `ArrayData` float representation instead. Null or
  * length-mismatched inputs yield null, matching SQL semantics.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData].toFloatArray()
    val b = r.asInstanceOf[ArrayData].toFloatArray()
    if (a.length != b.length) return null
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector (same fast path as [[FloatVectorDot]]). */
case class FloatVectorNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData].toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      acc += a(i).toDouble * a(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Dot product of two `array<float>` columns as double. */
  def vector_dot(a: Column, b: Column): Column =
    column(FloatVectorDot(expression(a), expression(b)))

  /** L2 norm of an `array<float>` column. */
  def vector_norm(a: Column): Column =
    column(FloatVectorNorm(expression(a)))

  /** Cosine similarity of two `array<float>` columns. */
  def vector_cosine(a: Column, b: Column): Column =
    vector_dot(a, b) / (vector_norm(a) * vector_norm(b))
}
