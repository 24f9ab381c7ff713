package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Streaming second-moment buffer for float vectors: count, per-dimension
  * sums, and the full Σxxᵀ outer-product sums (row-major d×d). O(d²)
  * state regardless of row count — the map-side partial is what makes a
  * covariance matrix over 100 TB one narrow aggregation instead of a d²×
  * row explosion.
  */
final class MomentsBuf {
  var d: Int = -1
  var n: Long = 0L
  var sum: Array[Double] = null
  var ss: Array[Double] = null

  def init(dims: Int): Unit = {
    d = dims
    sum = new Array[Double](dims)
    ss = new Array[Double](dims * dims)
  }

  def add(v: ArrayData): Unit = {
    if (d < 0) init(v.numElements())
    // Strict, not clamped: a silent prefix-clamp made ragged inputs give
    // partition-order-dependent moments (whichever length a partition saw
    // first won). Failing HERE — at update, with the offending length —
    // is deterministic for any partitioning; merge's dim check then only
    // guards serialization bugs, not data.
    else require(v.numElements() == d,
      s"vector_moments: mixed vector lengths (expected $d, got " +
        s"${v.numElements()}) — pad or filter ragged vectors upstream")
    n += 1
    var i = 0
    while (i < d) {
      val xi = v.getFloat(i).toDouble
      sum(i) += xi
      var j = 0
      val row = i * d
      while (j < d) {
        ss(row + j) += xi * v.getFloat(j).toDouble
        j += 1
      }
      i += 1
    }
  }

  def absorb(o: MomentsBuf): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    require(d == o.d,
      s"vector_moments: mixed vector lengths across partitions ($d vs " +
        s"${o.d}) — pad or filter ragged vectors upstream")
    n += o.n
    var i = 0
    while (i < d) { sum(i) += o.sum(i); i += 1 }
    var k = 0
    val dd = d * d
    while (k < dd) { ss(k) += o.ss(k); k += 1 }
  }
}

/** `vector_moments(vec)` → `struct(n: long, mean: array<double>,
  * cov: array<double>)` — population covariance, row-major d×d
  * (`cov[i*d + j] = E[x_i x_j] − E[x_i]E[x_j]`).
  */
case class VectorMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuf] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vector_moments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", ArrayType(DoubleType, containsNull = false)),
    StructField("cov", ArrayType(DoubleType, containsNull = false))))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MomentsBuf = new MomentsBuf

  override def update(buffer: MomentsBuf, input: InternalRow): MomentsBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: MomentsBuf, input: MomentsBuf): MomentsBuf = {
    buffer.absorb(input)
    buffer
  }

  override def eval(buffer: MomentsBuf): Any = {
    val d = math.max(buffer.d, 0)
    val n = math.max(buffer.n, 1L).toDouble
    val mean = new Array[Any](d)
    var i = 0
    while (i < d) { mean(i) = buffer.sum(i) / n; i += 1 }
    val cov = new Array[Any](d * d)
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        cov(i * d + j) = buffer.ss(i * d + j) / n -
          (buffer.sum(i) / n) * (buffer.sum(j) / n)
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      buffer.n, new GenericArrayData(mean), new GenericArrayData(cov)))
  }

  override def serialize(buffer: MomentsBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.d)
    out.writeLong(buffer.n)
    if (buffer.d > 0) {
      var i = 0
      while (i < buffer.d) { out.writeDouble(buffer.sum(i)); i += 1 }
      var k = 0
      val dd = buffer.d * buffer.d
      while (k < dd) { out.writeDouble(buffer.ss(k)); k += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MomentsBuf
    val d = in.readInt()
    val n = in.readLong()
    if (d > 0) {
      b.init(d)
      var i = 0
      while (i < d) { b.sum(i) = in.readDouble(); i += 1 }
      var k = 0
      val dd = d * d
      while (k < dd) { b.ss(k) = in.readDouble(); k += 1 }
    }
    b.d = d
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMoments =
    copy(child = newChild)
}

/** `k`-row projection of a float vector: `out = R · (x − μ)` with the
  * rows (optionally variance-scaled for whitening) riding as reference
  * objects — the [[NearestCells]] pattern: no join, no per-row matrix
  * shipping, one method call in generated code.
  */
case class ProjectVector(
    child: Expression,
    mean: Seq[Double],
    rows: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val r: Array[Array[Double]] = rows.map(_.toArray).toArray

  /** Public: called from generated code via a reference object. */
  def project(v: ArrayData): ArrayData = {
    val x = v.toFloatArray()
    val out = new Array[Any](r.length)
    var k = 0
    while (k < r.length) {
      val row = r(k)
      var s = 0.0
      var i = 0
      val m = math.min(x.length, math.min(row.length, mu.length))
      while (i < m) { s += row(i) * (x(i) - mu(i)); i += 1 }
      out(k) = s
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = project(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("projectVector", this,
      classOf[ProjectVector].getName)
    defineCodeGen(ctx, ev, a => s"$ref.project($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MomentsFunctions {
  def vector_moments(vec: Column): Column =
    GraftShim.column(
      VectorMoments(GraftShim.expression(vec)).toAggregateExpression())

  def project_vector(
      vec: Column, mean: Seq[Double], rows: Seq[Seq[Double]]): Column =
    GraftShim.column(
      ProjectVector(GraftShim.expression(vec), mean, rows))
}
