package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hash buckets of every unigram + bigram of a raw TEXT column,
  * for DSIR-style hashed bag-of-n-grams models ([[graft.ext.Dsir]]):
  * with tokens w_0..w_{n−1} the maximal whitespace-free runs, element
  * `i < n` is `md5Base60(salt|w_i) mod buckets`, element `n + i` is
  * `md5Base60(salt|w_i w_{i+1}) mod buckets` — the portable md5 family,
  * so an external engine re-derives every bucket
  * (`('0x' || substr(md5(g), 1, 15))::BIGINT % buckets`).
  *
  * One custom expression instead of regex-split + explode + per-gram
  * `conv(substring(md5(concat(...)), 1, 15), 16, 10)`: tokenization and
  * hashing fuse into a single byte scan with ONE reused digest, digests
  * fed from offsets into the row's own bytes — no token array, no
  * hex/decimal string round-trips. Kernel in
  * [[ExprRuntimes.dsirGramBuckets]], shared by the interpreted and
  * codegen paths.
  */
case class DsirGramBuckets(child: Expression, buckets: Long, salt: String)
    extends UnaryExpression {

  require(buckets > 0, s"buckets must be positive: $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val saltPrefix: Array[Byte] =
    (salt + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Public: called from generated code via a reference object. */
  def hash(v: UTF8String): ArrayData =
    ExprRuntimes.dsirGramBuckets(v, buckets, saltPrefix)

  override def nullSafeEval(v: Any): Any = hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirGramBuckets", this,
      classOf[DsirGramBuckets].getName)
    defineCodeGen(ctx, ev, a => s"$ref.hash($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirHashFunctions {
  /** `array<long>` of unigram + bigram feature-hash buckets of a raw
    * text column (tokenize + hash in one byte scan).
    */
  def dsir_gram_buckets(text: Column, buckets: Int, salt: String): Column =
    GraftShim.column(
      DsirGramBuckets(GraftShim.expression(text), buckets.toLong, salt))
}
