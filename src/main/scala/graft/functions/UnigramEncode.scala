package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenize a text column: per word, the Viterbi segmentation
  * maximizing the sum of piece log-probabilities (Kudo 2018's inference
  * step). Word boundaries are byte-for-byte the text stack's
  * (`UTF8String.trim` + Java `\s+` — the pair the t-family oracles pin),
  * so pieces never cross words and concatenating a word's pieces always
  * rebuilds the word.
  *
  * Coverage contract: any single code point ABSENT from the vocabulary
  * segments as itself at `unkLogProb` (far below every trained piece), so
  * encoding never fails and the round-trip invariant holds on unseen
  * characters too — SentencePiece's character-coverage fallback.
  *
  * Determinism: ties in the DP (equal scores) resolve to the LONGEST last
  * piece (the candidate with the earliest start index wins; candidates
  * are scanned longest-first). The piece table rides the expression
  * instance as a codegen reference object; generated code is one method
  * call per row — no shuffle, no UDF.
  */
case class UnigramEncode(
    child: Expression,
    pieces: Seq[(String, Double)],
    unkLogProb: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.putIfAbsent(p, lp) }
    m
  }

  @transient private lazy val maxPieceCp: Int =
    if (pieces.isEmpty) 1
    else math.max(1, pieces.map(p => p._1.codePointCount(0, p._1.length)).max)

  private def encodeWord(w: String, out: mutable.ArrayBuffer[Any]): Unit = {
    // code-point symbol array (piece boundaries are code points)
    val cps = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      cps += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    val n = cps.length
    if (n == 0) return
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    var end = 1
    while (end <= n) {
      // longest candidate first: on equal score the earliest start wins
      var start = math.max(0, end - maxPieceCp)
      while (start < end) {
        if (score(start) != Double.NegativeInfinity) {
          val piece = cps.slice(start, end).mkString
          val lp =
            if (end - start == 1) {
              val t = table.get(piece)
              if (t == null) unkLogProb else t.doubleValue()
            } else {
              val t = table.get(piece)
              if (t == null) Double.NaN else t.doubleValue()
            }
          if (!lp.isNaN) {
            val cand = score(start) + lp
            if (cand > score(end)) { score(end) = cand; back(end) = start }
          }
        }
        start += 1
      }
      end += 1
    }
    // reconstruct
    val rev = mutable.ArrayBuffer.empty[String]
    var at = n
    while (at > 0) {
      val s = back(at)
      rev += cps.slice(s, at).mkString
      at = s
    }
    var j = rev.length - 1
    while (j >= 0) { out += UTF8String.fromString(rev(j)); j -= 1 }
  }

  /** Public: called from generated code via a reference object. */
  def encode(text: UTF8String): ArrayData = {
    val toks = UnigramEncode.Whitespace.split(text.trim().toString, -1)
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
    val ref = ctx.addReferenceObj("unigramEncode", this,
      classOf[UnigramEncode].getName)
    defineCodeGen(ctx, ev, v => s"$ref.encode($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncode {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def apply(c: Column, pieces: Seq[(String, Double)],
      unkLogProb: Double): Column =
    GraftShim.column(UnigramEncode(GraftShim.expression(c), pieces, unkLogProb))
}
