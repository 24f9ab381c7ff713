package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", PAMI 2011): a d-dim float vector splits into
  * `m` subvectors of d/m dims; each subvector is replaced by the index of
  * its nearest centroid in that subspace's `ksub`-entry codebook, so the
  * whole vector compresses to m small ints. Asymmetric distance (ADC)
  * scores a FLOAT query against a CODED candidate by summing per-subspace
  * dot products looked up from the codebooks — the candidate's floats are
  * never needed, which is the property that lets the corpus side of a
  * retrieval join ship m ints instead of d floats.
  *
  * Same engineering stance as [[NearestCells]]: codebooks ride on the
  * expression as one reference object (not nlist × dims literal nodes),
  * and the generated code is a single method call, so Janino compile time
  * stays flat no matter the codebook size. Ragged vectors degrade to
  * truncated math (the shared clamp policy of the vector kernels).
  */
object ProductQuantize {

  private[functions] def toArrays(
      codebooks: Seq[Seq[Seq[Float]]]): Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
}

/** `pq_encode(vec)` → `array<int>` of length m: per-subspace nearest
  * centroid index (ties to the smaller index).
  *
  * Ranking is the same `v·c − |c|²/2` double-precision form as
  * [[NearestCells]] — equivalent to argmin squared-L2 in exact math, and
  * deliberately the SAME floating-point sequence the k-means oracles
  * replay in SQL (`list_sum` of per-dim double products minus half the
  * double norm), so a coded corpus is re-derivable bit-for-bit by an
  * independent engine. The earlier float-precision `(x−c)²` accumulation
  * ranked identically except at float-noise ties but was not portable.
  */
case class PqEncode(
    child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: empty codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    ProductQuantize.toArrays(codebooks)
  @transient private lazy val dsub: Int = cb(0)(0).length
  @transient private lazy val halfNorms: Array[Array[Double]] =
    cb.map(_.map(c => c.map(x => x.toDouble * x.toDouble).sum / 2.0))

  /** Public: called from generated code via a reference object. */
  def encode(v: ArrayData): ArrayData = {
    val x = v.toFloatArray()
    val m = cb.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      val book = cb(j)
      val hn = halfNorms(j)
      var best = -1
      var bs = Double.NegativeInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        // overlap-truncated math on ragged vectors: BOTH the dot and the
        // centroid half-norm restrict to the overlapping dims — subtracting
        // the full-length half-norm against a truncated dot would bias
        // selection toward small-norm centroids on the missing dims
        val n = math.min(cent.length, math.max(0, x.length - off))
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += x(off + i).toDouble * cent(i).toDouble; i += 1
        }
        val s =
          if (n == cent.length) dot - hn(c)
          else {
            var h = 0.0
            var t = 0
            while (t < n) { h += cent(t).toDouble * cent(t).toDouble; t += 1 }
            dot - h / 2.0
          }
        if (best < 0 || s > bs) { bs = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc_dot(query_vec, codes)` → double: Σ_j dot(query[j·dsub ..],
  * codebook_j[codes_j]) — the asymmetric approximation of
  * dot(query, candidate) from the candidate's codes alone.
  */
case class PqAdcDot(
    left: Expression, right: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends BinaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc_dot: empty codebooks")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    ProductQuantize.toArrays(codebooks)
  @transient private lazy val dsub: Int = cb(0)(0).length

  /** Public: called from generated code via a reference object. */
  def adcDot(q: ArrayData, codes: ArrayData): Double = {
    val x = q.toFloatArray()
    val m = math.min(cb.length, codes.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      val book = cb(j)
      if (code >= 0 && code < book.length) {
        val cent = book(code)
        val off = j * dsub
        var i = 0
        while (i < cent.length && off + i < x.length) {
          s += x(off + i).toDouble * cent(i).toDouble; i += 1
        }
      }
      j += 1
    }
    s
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    adcDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcDot", this, classOf[PqAdcDot].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.adcDot($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  /** `array<int>` of per-subspace nearest-centroid codes. */
  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    GraftShim.column(PqEncode(GraftShim.expression(vec), codebooks))

  /** ADC approximate dot product of a float query and a coded candidate. */
  def pq_adc_dot(
      query: Column, codes: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    GraftShim.column(
      PqAdcDot(GraftShim.expression(query), GraftShim.expression(codes),
        codebooks))
}
