package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH bucket id (Charikar 2002): bit i = sign of
  * `dot(vec, plane_i)`.
  *
  * Same rationale as [[NearestCells]]: the composable form (`planes` ×
  * `when(vector_dot(vec, typedlit(plane)) >= 0, …)` columns) inlines
  * planes × dims literals into generated code and Janino compile time
  * dwarfs execution; here the plane matrix is a reference object and the
  * generated code is one call.
  */
case class HyperplaneBucketExpr(child: Expression, planes: Seq[Seq[Float]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63, "1..63 hyperplanes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val mat: Array[Array[Float]] =
    planes.map(_.toArray).toArray

  /** Public: called from generated code via a reference object. */
  def bucket(v: ArrayData): Long = {
    val x = v.toFloatArray()
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val plane = mat(p)
      var dot = 0.0
      var i = 0
      while (i < x.length && i < plane.length) {
        dot += x(i).toDouble * plane(i).toDouble
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def nullSafeEval(v: Any): Any = bucket(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", this,
      classOf[HyperplaneBucketExpr].getName)
    defineCodeGen(ctx, ev, a => s"$ref.bucket($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketFunctions {
  /** LSH bucket id of an `array<float>` column for the given planes. */
  def hyperplane_bucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    GraftShim.column(
      HyperplaneBucketExpr(GraftShim.expression(vec), planes))
}
