package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints as a native, codegen'd expression:
  * distinct sliding-window minima over character-`k`-gram hashes, the MOSS
  * substring-sampling scheme. Guarantees any shared substring of
  * `k + w − 1` chars yields a shared fingerprint while keeping only
  * ~2/(w+1) of positions — the candidate generator for substring-level
  * dedup ([[graft.ext.Fingerprint]]). Kernel shared with the interpreted
  * path in [[ExprRuntimes.winnowFingerprints]].
  */
case class WinnowFingerprints(
    child: Expression, k: Int, w: Int, portable: Boolean)
    extends UnaryExpression {
  require(k >= 2 && k <= 10000, s"gram size k out of 2..10000: $k")
  require(w >= 1 && w <= 10000, s"window size w out of 1..10000: $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.winnowFingerprints(v.asInstanceOf[UTF8String], k, w, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.ExprRuntimes.winnowFingerprints($t, $k, $w, $portable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  /** Distinct winnowing fingerprints of `text`, first-window order.
    * `portable = true` (MD5₄₈ gram hashes) is cross-engine-reproducible
    * for persisted indexes; `portable = false` (XXH64) is the cheap
    * job-internal setting.
    */
  def fingerprints(
      text: Column, k: Int, w: Int, portable: Boolean = true): Column =
    GraftShim.column(
      WinnowFingerprints(GraftShim.expression(text), k, w, portable))
}
