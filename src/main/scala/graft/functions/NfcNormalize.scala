package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column (canonical composition:
  * `e` + COMBINING ACUTE → `é`). The cleanup step every crawled corpus
  * needs before fingerprinting or dedup — the same text scraped from two
  * sites can differ only in composition form, which would defeat an exact
  * fingerprint and skew shingle sets.
  *
  * Spark has no built-in for this (reference gap too — the reference
  * normalizes column NAMES only, spark_dataframe_service.py:89-104), so
  * it is a native expression: `Normalizer.isNormalized` fast-path skips
  * the allocation entirely for already-NFC text (all ASCII, most real
  * UTF-8), and generated code is one method call on a reference object —
  * the whole-stage-codegen shape shared by all graft kernels.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  /** Public: called from generated code via a reference object. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any = nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, a => s"$ref.nfc($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcFunctions {
  /** Unicode NFC (canonical composition) of a string column. */
  def nfc_normalize(s: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(s)))
}
