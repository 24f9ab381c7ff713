package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-encode a text column against an ordered merge list: tokens of all
  * words in document order, merges never crossing word boundaries.
  *
  * Word boundary semantics are byte-for-byte those of the rest of the
  * text stack (`UTF8String.trim` = ASCII-space trim, Java `\s+` split —
  * the pair the t-family oracles pin). Per word, the standard greedy
  * loop: repeatedly merge the present pair with the lowest rank
  * (= earliest in training order), all occurrences left to right. Words
  * are short, so the loop is O(word² ) worst case on a dozen symbols —
  * the corpus-scale cost is one linear scan per document, no shuffle.
  * The merge table rides the expression instance as a codegen reference
  * object; generated code is a single method call per row.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // NUL never appears in a symbol (symbols come from \s+-split
      // word text), so it is a safe pair separator
      m.putIfAbsent(a + "\u0000" + b, i)
    }
    m
  }

  private def encodeWord(w: String, out: mutable.ArrayBuffer[Any]): Unit = {
    // split to code-point symbols
    val syms = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    if (!ranks.isEmpty) {
      var continue = syms.length > 1
      while (continue) {
        // lowest-rank pair present
        var bestRank = Int.MaxValue
        var j = 0
        while (j < syms.length - 1) {
          val r = ranks.get(syms(j) + "\u0000" + syms(j + 1))
          if (r != null && r < bestRank) bestRank = r
          j += 1
        }
        if (bestRank == Int.MaxValue) continue = false
        else {
          val (a, b) = merges(bestRank)
          val joined = a + b
          j = 0
          while (j < syms.length - 1) {
            if (syms(j) == a && syms(j + 1) == b) {
              syms.update(j, joined)
              syms.remove(j + 1)
            } else j += 1
          }
          continue = syms.length > 1
        }
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  /** Public: called from generated code via a reference object. */
  def encode(text: UTF8String): ArrayData = {
    val toks = BpeEncode.Whitespace.split(text.trim().toString, -1)
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) encodeWord(toks(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, v => s"$ref.encode($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftShim.column(BpeEncode(GraftShim.expression(c), merges))
}
