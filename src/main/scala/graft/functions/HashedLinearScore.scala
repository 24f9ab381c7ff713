package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `w·x + b` for a hashed-feature row: `x` arrives as the array of feature
  * INDICES (duplicates = counts), the dense weight vector rides on the
  * expression as a reference object — the same pattern as
  * [[NearestCells]]: no per-row weight shipping, no explode, no join; the
  * generated code is one method call and the whole scoring pass stays
  * inside whole-stage codegen. Out-of-range indices are ignored
  * (length-clamp policy of the other kernels).
  */
case class HashedLinearScore(
    child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val w: Array[Double] = weights.toArray

  /** Public: called from generated code via a reference object. */
  def score(idx: ArrayData): Double = {
    var s = bias
    var i = 0
    val n = idx.numElements()
    while (i < n) {
      val j = idx.getInt(i)
      if (j >= 0 && j < w.length) s += w(j)
      i += 1
    }
    s
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedLinearScore", this,
      classOf[HashedLinearScore].getName)
    defineCodeGen(ctx, ev, a => s"$ref.score($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedLinearScore {
  def linear_score(idx: Column, weights: Seq[Double], bias: Double): Column =
    GraftShim.column(
      HashedLinearScore(GraftShim.expression(idx), weights, bias))
}
