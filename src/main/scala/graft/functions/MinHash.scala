package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-function MinHash signature (Broder 1997, "On the resemblance and
  * containment of documents") of an `array<string>` shingle set:
  * `sig[j] = min over shingles of h_j(shingle)` where
  * `h_j(s) = xxHash64(xxHash64(s, 0), seed=j)`.
  *
  * One custom expression instead of k `array_min(transform(...))` calls:
  * a single pass over the shingle array — k× fewer array traversals and no
  * per-element lambda frames. Each shingle's bytes are hashed ONCE; the k
  * per-seed values derive from re-hashing the resulting 8-byte value
  * (`XXH64.hashLong`), not from k passes over the string — the standard
  * one-hash+k-mixes construction, ~k× less byte hashing, which is the
  * difference between minutes and hours on a 100 TB dedup sweep. Kernel in
  * [[ExprRuntimes.minhash]], shared by the interpreted and codegen paths.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "minhash k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ExprRuntimes.minhash(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprRuntimes.minhash($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PORTABLE k-function MinHash signature: lane j applies the affine
  * permutation `(a_j·base + b_j) mod (2⁶¹−1)` to each shingle's 60-bit MD5
  * base hash and keeps the minimum, with `(a_j, b_j)` themselves derived
  * from `md5("mh|salt|a|j")` / `md5("mh|salt|b|j")` — so an independent
  * engine can re-derive coefficients, per-shingle base hashes, every lane
  * value, and therefore the exact LSH pair set, misses included (DuckDB:
  * `('0x' || substr(md5(k),1,15))::BIGINT` + HUGEINT modular arithmetic).
  * That is what upgrades the production-parameter minhash declaration from
  * a recall-only companion to a full value oracle. ~10× more per-shingle
  * hash cost than the XXH64 default ([[MinHashSignature]]) — the portable
  * family is for signatures that must outlive this engine (oracles,
  * cross-system index exchange), not the cheapest internal sweep.
  *
  * Kernel in [[ExprRuntimes.minhashPortable]]; coefficient tables ride the
  * expression as one reference object (the [[PqEncode]] pattern), so the
  * generated code is a single call and Janino compile time stays flat.
  */
case class MinHashSignaturePortable(child: Expression, k: Int, salt: String)
    extends UnaryExpression {

  require(k > 0, "minhash k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(k)(j => ExprRuntimes.md5Base60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"mh|$salt|a|$j")) + 1L)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(k)(j => ExprRuntimes.md5Base60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"mh|$salt|b|$j")))

  /** Public: called from generated code via a reference object. */
  def sign(v: ArrayData): ArrayData =
    ExprRuntimes.minhashPortable(v, coefA, coefB)

  override def nullSafeEval(v: Any): Any = sign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashPortable", this,
      classOf[MinHashSignaturePortable].getName)
    defineCodeGen(ctx, ev, a => s"$ref.sign($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  /** `array<long>` MinHash signature of an `array<string>` column. */
  def minhash_signature(shingles: Column, k: Int): Column =
    GraftShim.column(
      MinHashSignature(GraftShim.expression(shingles), k))

  /** Cross-engine-reproducible `array<long>` MinHash signature (MD5 base
    * hashes + md5-derived affine lanes over the 2⁶¹−1 field).
    */
  def minhash_signature_portable(shingles: Column, k: Int, salt: String): Column =
    GraftShim.column(
      MinHashSignaturePortable(GraftShim.expression(shingles), k, salt))
}
