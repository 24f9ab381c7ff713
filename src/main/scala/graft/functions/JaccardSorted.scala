package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact Jaccard similarity of two SORTED, DISTINCT `array<string>` columns
  * via a single merge walk — no hash sets, no intermediate arrays, one pass.
  *
  * `array_intersect`+`array_union` (the composable form in
  * [[graft.ext.Shingles.jaccard]]) builds two hash structures and three
  * result arrays per evaluation; at millions of candidate pairs per LSH
  * verify stage that allocation is the dominant dedup cost. The merge walk
  * is O(|a|+|b|) with zero allocation. Inputs MUST be sorted ascending and
  * duplicate-free (`array_sort(array_distinct(...))`) — the dedup pipeline
  * sorts its shingle sets once per unique set, then verifies many pairs.
  *
  * Ordering note: the walk compares with `UTF8String.compareTo` (binary),
  * the same ordering `array_sort` produces for strings.
  *
  * Semantics match [[graft.ext.Shingles.jaccard]]: empty∪empty → 0.0.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprRuntimes.jaccardSorted(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprRuntimes.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardFunctions {
  /** Jaccard of two sorted distinct `array<string>` columns. */
  def jaccard_sorted(a: Column, b: Column): Column =
    GraftShim.column(
      JaccardSorted(GraftShim.expression(a), GraftShim.expression(b)))
}
