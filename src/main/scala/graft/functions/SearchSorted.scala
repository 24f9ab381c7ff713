package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Bucket index of a double against a small sorted boundary array: the
  * number of boundaries `<=` the value (so `bounds.length` boundaries
  * define `bounds.length + 1` buckets, and ties land in the upper bucket,
  * matching the usual upper-bound convention).
  *
  * This is the quantile-bucketing kernel for range-derived layouts
  * (z-order): the boundary array is tiny (hundreds of doubles from
  * `approxQuantile`), lives on the expression instance as a codegen
  * reference object, and each row pays one binary search — against the
  * composable alternative (`aggregate` over a literal array), which walks
  * every boundary per row in the interpreted higher-order path.
  */
case class SearchSorted(child: Expression, bounds: Seq[Double])
    extends UnaryExpression {
  require(bounds.nonEmpty, "SearchSorted needs at least one boundary")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val sorted: Array[Double] = {
    val arr = bounds.toArray
    require(arr.zip(arr.tail).forall { case (a, b) => a <= b },
      "SearchSorted boundaries must be sorted ascending")
    arr
  }

  /** Public: called from generated code via a reference object. */
  def bucket(v: Double): Int = {
    val i = Arrays.binarySearch(sorted, v)
    if (i >= 0) {
      // land ties in the upper bucket, scanning past duplicates
      var j = i
      while (j < sorted.length && sorted(j) == v) j += 1
      j
    } else -(i + 1)
  }

  override def nullSafeEval(v: Any): Any = bucket(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("searchSorted", this, classOf[SearchSorted].getName)
    defineCodeGen(ctx, ev, v => s"$ref.bucket($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SearchSorted {
  def apply(c: Column, bounds: Seq[Double]): Column =
    GraftShim.column(SearchSorted(GraftShim.expression(c), bounds))
}
