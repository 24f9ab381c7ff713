package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `nprobe` nearest centroid ids of a float vector, nearest first
  * (squared-L2 via the `v·c − |c|²/2` ranking; ties break to the smaller
  * centroid index).
  *
  * A custom expression rather than `array_sort` over per-centroid
  * `struct(vector_dot(v, typedlit(c)), …)` columns: that form inlines
  * nlist × dims literal nodes into the generated code (twice, once per
  * probe side), and Janino compile time — not execution — dominated the
  * query. Here the codebook lives on the expression as a reference object
  * and the generated code is one method call.
  */
case class NearestCells(
    child: Expression, centroids: Seq[Seq[Float]], nprobe: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.size)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val halfNorms: Array[Double] =
    cents.map(c => c.map(x => x.toDouble * x.toDouble).sum / 2.0)

  /** Public: called from generated code via a reference object. */
  def cells(v: ArrayData): ArrayData = {
    val x = v.toFloatArray()
    val n = cents.length
    val scores = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = cents(c)
      var dot = 0.0
      var i = 0
      while (i < x.length && i < cent.length) {
        dot += x(i).toDouble * cent(i).toDouble
        i += 1
      }
      scores(c) = dot - halfNorms(c)
      c += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](n)
    var p = 0
    while (p < nprobe) {
      // seed `best` with the first untaken index so a NaN-poisoned score
      // vector (every comparison false) still yields a deterministic cell
      // instead of indexing taken(-1)
      var best = -1
      var bs = Double.NegativeInfinity
      var j = 0
      while (j < n) {
        if (!taken(j) && (best < 0 || scores(j) > bs)) {
          bs = scores(j); best = j
        }
        j += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = cells(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    defineCodeGen(ctx, ev, a => s"$ref.cells($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CellFunctions {
  /** `array<int>` of the nprobe nearest centroids, nearest first. */
  def nearest_cells(vec: Column, centroids: Seq[Seq[Float]], nprobe: Int): Column =
    GraftShim.column(
      NearestCells(GraftShim.expression(vec), centroids, nprobe))
}
