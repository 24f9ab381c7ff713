package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of a token array's elements present in a small fixed vocabulary
  * (binary search over the pre-sorted profile).
  *
  * The composable form — `size(array_intersect(ts, typedlit(profile)))`
  * once per language profile — generates a large Janino unit per profile;
  * with 4+ profiles inside one `langId` projection, code COMPILATION (not
  * execution) dominated small-batch latency. This expression is one method
  * call in generated code; the profile lives on the expression instance as
  * a reference object.
  */
case class StopwordHits(child: Expression, profile: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val sorted: Array[AnyRef] = {
    val arr = profile.map(UTF8String.fromString(_): AnyRef).toArray
    Arrays.sort(arr)
    arr
  }

  /** Public: called from generated code via a reference object. */
  def hits(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (!tokens.isNullAt(i) &&
        Arrays.binarySearch(sorted, tokens.getUTF8String(i)) >= 0) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(v: Any): Any = hits(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
    defineCodeGen(ctx, ev, a => s"$ref.hits($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordFunctions {
  /** Count of `tokens` elements found in `profile`. */
  def stopword_hits(tokens: Column, profile: Seq[String]): Column =
    GraftShim.column(StopwordHits(GraftShim.expression(tokens), profile))
}
