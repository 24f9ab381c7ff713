package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding math (SURVEY.md §7.5).
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates a lambda frame per element; at 100 TB (billions of rows × 64+
  * dims) that is the hot loop, so these run as tight primitive loops over
  * Spark's `ArrayData` float representation ([[ExprRuntimes]]) and
  * participate in whole-stage codegen via `doGenCode` (no fallback boxing).
  * Null or length-mismatched inputs yield null, matching SQL semantics.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    ExprRuntimes.vectorDot(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.ExprRuntimes.vectorDot($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector (same fast path as [[FloatVectorDot]]). */
case class FloatVectorNorm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.vectorNorm(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprRuntimes.vectorNorm($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 scalar quantization of a float vector: each component
  * becomes `round(v / (maxabs/127))` clamped to [-127, 127], packed as
  * BinaryType — 4× less scan/broadcast bandwidth than float32, the
  * first-stage representation for billion-vector retrieval. The scale is
  * recoverable as [[VectorMaxAbs]]/127; a zero vector quantizes to zero
  * bytes.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.quantizeInt8(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprRuntimes.quantizeInt8($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Largest |component| of a float vector (the int8 scale × 127). */
case class VectorMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.vectorMaxAbs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprRuntimes.vectorMaxAbs($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two int8-quantized vectors (BinaryType), as
  * long — the first-stage scorer; callers rescale by both sides' scales
  * to approximate the float dot.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return null
    ExprRuntimes.int8Dot(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.length != $b.length) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.ExprRuntimes.int8Dot($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two `array<float>` columns as double. */
  def vector_dot(a: Column, b: Column): Column =
    column(FloatVectorDot(expression(a), expression(b)))

  /** L2 norm of an `array<float>` column. */
  def vector_norm(a: Column): Column =
    column(FloatVectorNorm(expression(a)))

  /** Cosine similarity of two `array<float>` columns. Null (not a
    * DIVIDE_BY_ZERO failure under ANSI mode, not NaN under legacy mode)
    * when either vector has zero norm — see `graft.ext.Similarity.cosine`.
    */
  def vector_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.try_divide(
      vector_dot(a, b), vector_norm(a) * vector_norm(b))

  /** int8-quantize an `array<float>` column to binary. */
  def vector_quantize_int8(a: Column): Column =
    column(QuantizeInt8(expression(a)))

  /** Largest |component| of an `array<float>` column. */
  def vector_max_abs(a: Column): Column =
    column(VectorMaxAbs(expression(a)))

  /** Integer dot of two int8-quantized (binary) columns as long. */
  def vector_int8_dot(a: Column, b: Column): Column =
    column(Int8Dot(expression(a), expression(b)))
}
