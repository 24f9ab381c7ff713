package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `cap_occurrences(arr, cap)` → `array<int>`: at most `cap` copies of each
  * distinct value (sorted order; callers sum over the result, so order is
  * free). The saturation kernel for hashed count features
  * ([[graft.ext.QualityClassifier.featureIndices]]).
  *
  * A native expression instead of `filter(array_sort(x), lambda)` on
  * purpose: a lambda that needs to LOOK BACK at the sorted array must
  * reference it as a second subtree, and Catalyst re-evaluates that whole
  * subtree — tokenize, hash, sort — once per ELEMENT, turning an O(n log n)
  * row into O(n² log n) (measured 3× on t16's training pass). Here the
  * sort-and-cap is one JVM call per row, and the generated code is a
  * single method invocation on a reference object (same stance as
  * [[PqEncode]]).
  */
case class CapOccurrences(child: Expression, cap: Int)
    extends UnaryExpression {

  require(cap >= 1, s"cap_occurrences: cap must be >= 1, got $cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cap_occurrences requires array<int>, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  /** Public: called from generated code via a reference object. Null
    * slots in the input (legal when the column's element type carries
    * containsNull=true) are dropped rather than crashing `toIntArray` —
    * a null token index contributes no count mass either way.
    */
  def capArr(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var xs = new Array[Int](n)
    var m = 0
    var k = 0
    while (k < n) {
      if (!a.isNullAt(k)) { xs(m) = a.getInt(k); m += 1 }
      k += 1
    }
    if (m != n) xs = java.util.Arrays.copyOf(xs, m)
    java.util.Arrays.sort(xs)
    var kept = 0
    var i = 0
    var run = 0
    while (i < xs.length) {
      run = if (i > 0 && xs(i) == xs(i - 1)) run + 1 else 1
      if (run <= cap) { xs(kept) = xs(i); kept += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(xs, kept))
  }

  override def nullSafeEval(v: Any): Any = capArr(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("capOcc", this, classOf[CapOccurrences].getName)
    defineCodeGen(ctx, ev, a => s"$ref.capArr($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CapOccurrences {
  def cap_occurrences(arr: Column, cap: Int): Column =
    GraftShim.column(CapOccurrences(GraftShim.expression(arr), cap))
}
