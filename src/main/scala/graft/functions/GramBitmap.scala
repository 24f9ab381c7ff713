package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-hash Bloom bitmap of a string set, as `array<long>` (`words` × 64
  * bits), plus the pruning counter that makes it useful: for sets A, B
  * with bitmaps bm(A), bm(B),
  *
  * {{{ |A \ B|  >=  popcount(bm(A) & ~bm(B)) }}}
  *
  * — every bit set by A but untouched by B belongs to at least one gram of
  * A that B cannot contain, and distinct bits witness distinct grams. So
  * `|A∩B| <= |A| − popcount(bm(A) & ~bm(B))` is an EXACT upper bound (hash
  * collisions only weaken it, never break it), and filtering candidate
  * pairs on it preserves recall by construction. The point at scale: the
  * pruning join ships `words × 8` bytes per doc instead of the full
  * multi-KB shingle array, and the survivors that reach the exact
  * intersect are within a small factor of the true result size.
  */
case class GramBitmap(child: Expression, words: Int)
    extends UnaryExpression {
  require(words >= 1 && words <= 1024, s"words out of range: $words")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    GramBitmap.build(v.asInstanceOf[ArrayData], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.GramBitmap.build($a, $words)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramBitmap {
  /** Public: called from generated code. */
  def build(arr: ArrayData, words: Int): ArrayData = {
    val bits = new Array[Long](words)
    val m = words * 64
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
      val bit = java.lang.Math.floorMod(h, m)
      bits(bit >> 6) |= 1L << (bit & 63)
      i += 1
    }
    new GenericArrayData(bits)
  }
}

/** `popcount(a & ~b)` over two equal-length long-array bitmaps — the
  * left-not-right witness count of [[GramBitmap]].
  */
case class BitmapAndNotCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapAndNotCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitmapAndNotCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitmapAndNotCount {
  /** Public: called from generated code. Length-clamped like the other
    * vector kernels — ragged inputs degrade, never crash.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & ~b.getLong(i))
      i += 1
    }
    // left words beyond b's length have no counterpart: every set bit is a
    // left-only witness
    var j = n
    val an = a.numElements()
    while (j < an) {
      c += java.lang.Long.bitCount(a.getLong(j))
      j += 1
    }
    c
  }
}

object BitmapFunctions {
  /** `array<long>` bitmap (`words`×64 bits) of a string array. */
  def gram_bitmap(arr: Column, words: Int): Column =
    GraftShim.column(GramBitmap(GraftShim.expression(arr), words))

  /** popcount(a & ~b) of two bitmaps. */
  def bitmap_andnot_count(a: Column, b: Column): Column =
    GraftShim.column(BitmapAndNotCount(
      GraftShim.expression(a), GraftShim.expression(b)))
}
