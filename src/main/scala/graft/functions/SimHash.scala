package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash (Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms") over a token array: each token's 64-bit xxHash votes +1/-1
  * per bit position; the signature's bit j is 1 iff the vote sum is
  * positive. Near-duplicate documents land within a small Hamming distance.
  *
  * A custom expression because the composable form is 64 `aggregate()`
  * higher-order calls per row — this is one tight loop per row (64 counters,
  * one xxHash per token, [[ExprRuntimes.simhash64]]), codegen'd via
  * `doGenCode`, the shape that survives a 100 TB corpus.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.simhash64(v.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprRuntimes.simhash64($a, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit PORTABLE SimHash over a token array: votes come from each
  * token's 60-bit MD5 base hash ([[ExprRuntimes.md5Base60]]) instead of
  * XXH64, and the signature stops at 60 bits so it and its 15-bit
  * pigeonhole chunks fit a signed SQL BIGINT — every signature is then
  * re-derivable in DuckDB (`('0x' || substr(md5(tok),1,15))::BIGINT`, 60
  * per-bit vote sums, same strict `> 0` tie rule), which upgrades the
  * simhash dedup declaration to a full value oracle. Same single-pass
  * kernel shape as [[SimHash64]]; ~10× per-token hash cost — the portable
  * family's documented trade.
  */
case class SimHash60Md5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.simhash60Md5(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprRuntimes.simhash60Md5($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** xxHash64 of a single string with an arbitrary seed — the per-band hash
  * family for MinHash (Spark's built-in `xxhash64` fixes seed=42; MinHash
  * needs k independent functions, cheaply seeded here).
  */
case class XxHash64Seeded(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    XXH64.hashUTF8String(v.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => "org.apache.spark.sql.catalyst.expressions.XXH64" +
        s".hashUTF8String($s, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** 64-bit SimHash signature of an `array<string>` token column. */
  def simhash64(tokens: Column, seed: Long = 0L): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens), seed))

  /** Cross-engine-reproducible 60-bit SimHash signature (MD5 token
    * hashes).
    */
  def simhash60_md5(tokens: Column): Column =
    GraftShim.column(SimHash60Md5(GraftShim.expression(tokens)))

  def xxhash64_seeded(s: Column, seed: Long): Column =
    GraftShim.column(
      XxHash64Seeded(GraftShim.expression(s.cast(StringType)), seed))
}
