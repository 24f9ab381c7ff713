package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._

/** Serialization for [[QuantileSummaries]] (the Greenwald–Khanna summary
  * behind Spark's own `approx_percentile`/`approxQuantile`) so the sketch
  * can LEAVE the aggregation: persisted as a parquet binary column per
  * segment, merged later without rescanning data. Spark exposes the
  * algorithm but not the summary; this codec is what turns it into a
  * first-class, storable object — the quantile sibling of the HLL
  * distinct-count sketches in [[graft.ops.Sketches]].
  *
  * Format: version byte, compressThreshold, relativeError, count, then
  * (value, g, delta) triples of the compressed sample array.
  */
object QuantileSketchCodec {
  private final val Version: Byte = 1

  def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Version)
    out.writeInt(qs.compressThreshold)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    out.writeInt(qs.sampled.length)
    qs.sampled.foreach { s =>
      out.writeDouble(s.value)
      out.writeLong(s.g)
      out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readByte()
    require(v == Version, s"quantile sketch version $v unsupported")
    val threshold = in.readInt()
    val relErr = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n)(new QuantileSummaries.Stats(
      in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(threshold, relErr, sampled, count, true)
  }

  /** Query kernel shared by interpreted and generated code. An EMPTY
    * sketch yields an empty array (never null — `defineCodeGen` assigns
    * the result unconditionally, so a null here would corrupt the
    * codegen null-tracking).
    */
  def queryArray(bytes: Array[Byte], probs: Array[Double]): GenericArrayData = {
    val qs = fromBytes(bytes)
    if (qs.count == 0L) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(probs.map(p => qs.query(p).get))
  }
}

/** Build aggregate: fold raw doubles into ONE serialized GK summary per
  * group — `est` rank error ≤ `relativeError · n`, size O(1/relativeError
  * · log(ε·n)), mergeable. The map-side partial collapses each partition
  * to a summary before the exchange, exactly like Spark's own
  * percentile_approx — but the OUTPUT is the sketch itself, ready to
  * persist.
  */
case class QuantileSketchAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1,
    s"relativeError out of (0,1): $relativeError")

  override def prettyName: String = "graft_quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric column, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError,
      Array.empty, 0L, false)

  override def update(
      buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v.asInstanceOf[Number].doubleValue())
  }

  override def merge(
      buffer: QuantileSummaries,
      input: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(input.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketchCodec.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketchCodec.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}

/** Merge aggregate: union already-serialized sketches (a rollup over a
  * persisted sketch table) — rank error bounds ADD across merges, so a
  * two-level build+merge stays within 2·relativeError. No raw data is
  * touched.
  */
case class QuantileSketchMergeAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1,
    s"relativeError out of (0,1): $relativeError")

  override def prettyName: String = "graft_quantile_sketch_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError,
      Array.empty, 0L, false)

  override def update(
      buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.compress()
      .merge(QuantileSketchCodec.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(
      buffer: QuantileSummaries,
      input: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(input.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketchCodec.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketchCodec.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): QuantileSketchMergeAgg =
    copy(child = c)
}

/** Scalar probe: quantile estimates out of a serialized sketch —
  * `array<double>` aligned with `probs`; empty array for an empty sketch.
  */
case class QuantileSketchQuery(child: Expression, probs: Seq[Double])
    extends UnaryExpression {
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"probs must be within [0,1] and non-empty: $probs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val probsArr = probs.toArray

  override def nullSafeEval(v: Any): Any =
    QuantileSketchCodec.queryArray(v.asInstanceOf[Array[Byte]], probsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probs", probsArr, "double[]")
    defineCodeGen(ctx, ev,
      b => s"graft.functions.QuantileSketchCodec.queryArray($b, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): QuantileSketchQuery =
    copy(child = c)
}

object QuantileFunctions {
  /** Build a per-group serialized GK quantile sketch. */
  def quantileSketch(value: Column, relativeError: Double = 0.01): Column =
    GraftShim.column(
      QuantileSketchAgg(GraftShim.expression(value), relativeError)
        .toAggregateExpression())

  /** Merge serialized sketches (rollup over a persisted sketch table). */
  def quantileSketchMerge(
      sketch: Column, relativeError: Double = 0.01): Column =
    GraftShim.column(
      QuantileSketchMergeAgg(GraftShim.expression(sketch), relativeError)
        .toAggregateExpression())

  /** Probe a serialized sketch for quantile estimates. */
  def quantileSketchGet(sketch: Column, probs: Seq[Double]): Column =
    GraftShim.column(
      QuantileSketchQuery(GraftShim.expression(sketch), probs))
}
