package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContain(key)` as a codegen'd Catalyst predicate over a
  * BROADCAST bloom filter.
  *
  * The filter rides a `Broadcast` handle, not the expression tree: task
  * serialization ships only the small handle, and each executor pulls the
  * bitset once (torrent broadcast) no matter how many tasks probe it —
  * at 100 TB a probe side has ~10^5 tasks, and a multi-MB filter embedded
  * per-task would dominate scheduler traffic. Codegen resolves the
  * broadcast via `addReferenceObj` and calls the primitive
  * `mightContainLong`/UTF-8-bytes path directly, so the probe stays inside
  * whole-stage codegen with no boxing.
  *
  * Long keys probe `mightContainLong`; string keys probe the UTF-8 bytes
  * (`mightContainBinary`), matching what `DataFrameStatFunctions
  * .bloomFilter` inserted on the build side.
  */
case class BloomMightContain(
    child: Expression,
    bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom probe key must be bigint or string, got $other")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bloom.value.mightContainLong(v.asInstanceOf[Long])
    case StringType =>
      bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val probe = child.dataType match {
      case LongType => (v: String) =>
        s"((org.apache.spark.util.sketch.BloomFilter)$bc.value()).mightContainLong($v)"
      case StringType => (v: String) =>
        s"((org.apache.spark.util.sketch.BloomFilter)$bc.value()).mightContainBinary($v.getBytes())"
    }
    defineCodeGen(ctx, ev, probe)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftShim.column(BloomMightContain(GraftShim.expression(key), bloom))
}
