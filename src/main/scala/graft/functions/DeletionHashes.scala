package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FastSS deletion-neighborhood hashes as a native, codegen'd expression:
  * the distinct 64-bit hashes of every variant of the input with up to
  * `d` characters deleted (original included). Candidate generator for
  * [[graft.ops.FuzzyJoin]] — two strings within Levenshtein distance `d`
  * always share a neighborhood member, so an equi-join on these hashes
  * never misses a true pair; the exact `levenshtein` verify drops the
  * false ones. Kernel shared with the interpreted path in
  * [[ExprRuntimes.deletionHashes]].
  */
case class DeletionHashes(child: Expression, d: Int)
    extends UnaryExpression {
  require(d >= 1 && d <= 2, s"deletion distance must be 1 or 2, got $d")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.deletionHashes(v.asInstanceOf[UTF8String], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.ExprRuntimes.deletionHashes($t, $d)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
