package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a text column as a native, codegen'd expression — one
  * whitespace split per document instead of one per OUTPUT GRAM, which is
  * what the composed `transform`/`slice`/`split` form degenerates to in
  * Spark's interpreted higher-order-function path (higher-order lambdas
  * never enter whole-stage codegen, and every lambda application
  * re-evaluates the `split` subtree). Measured on the contamination
  * sweep's 13-grams this is the difference between minutes of single-task
  * CPU and a sub-second scan. Semantics are bit-identical to the composed
  * form: space-only trim, Java `\s+` split keeping interior empties,
  * single-space joins, `array_distinct` first-occurrence order.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.wordNGrams(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.ExprRuntimes.wordNGrams($t, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-grams as a native expression: one byte walk over
  * the UTF-8 encoding instead of an O(position) code-point seek per output
  * gram (the `substr(text, i, n)` composed form is O(len²) per document).
  * Gram boundaries are UTF-8 char starts — exactly the code-point
  * arithmetic `substr` uses. `distinct` yields the shingle-set view;
  * duplicates-kept yields the positional multiset the language-model
  * counters need.
  */
case class CharNGrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.charNGrams(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.ExprRuntimes.charNGrams($t, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGrams {
  /** All word n-grams in order, duplicates kept. */
  def wordNGramsAll(text: Column, n: Int): Column =
    GraftShim.column(WordNGrams(GraftShim.expression(text), n, distinct = false))

  /** Distinct word n-grams, first-occurrence order. */
  def wordNGrams(text: Column, n: Int): Column =
    GraftShim.column(WordNGrams(GraftShim.expression(text), n, distinct = true))

  /** Distinct character n-grams, first-occurrence order. */
  def charNGrams(text: Column, n: Int): Column =
    GraftShim.column(CharNGrams(GraftShim.expression(text), n))

  /** ALL character n-grams in order, duplicates kept (the positional
    * multiset — language-model counting needs every occurrence).
    */
  def charNGramsAll(text: Column, n: Int): Column =
    GraftShim.column(
      CharNGrams(GraftShim.expression(text), n, distinct = false))
}
