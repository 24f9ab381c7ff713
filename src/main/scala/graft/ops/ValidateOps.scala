package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators (SURVEY.md §2.10 V1–V3).
  *
  * The reference validates scraped records with a schematics model
  * (etl_projects/scrapers/validators.py:5-13 — required int/float/string
  * fields plus a `\d{4}-\d{2}-\d{2}` date regex) and annotates failures onto
  * the records (settings.py:34); post-run monitors assert a minimum item
  * count and zero validation errors (monitors.py:5-31).
  *
  * Here validation is a single distributed projection: each rule compiles to
  * a Catalyst expression contributing an error string (or null), collected
  * into a `_validation_errors` array column — no driver-side loop, fully
  * codegen'd, so it costs one pass regardless of row count.
  */
object ValidateOps {

  final val ErrorsColumn = "_validation_errors"

  /** One declarative field rule. `check` returns true when the value is
    * acceptable (nulls are handled by `required` separately).
    */
  final case class FieldRule(
      field: String,
      required: Boolean = true,
      check: Option[Column => Column] = None,
      message: String = "invalid")

  object FieldRule {
    def requiredField(field: String): FieldRule = FieldRule(field)

    def matching(field: String, regex: String): FieldRule =
      FieldRule(field, check = Some(_.rlike(regex)), message = s"!~ $regex")

    def nonNegative(field: String): FieldRule =
      FieldRule(field, check = Some(_ >= 0), message = "< 0")

    def oneOf(field: String, values: Seq[String]): FieldRule =
      FieldRule(
        field,
        check = Some(_.isin(values: _*)),
        message = s"not in ${values.mkString("{", ",", "}")}")
  }

  implicit class DataFrameValidateOps(val df: DataFrame) extends AnyVal {

    /** V1 — append `_validation_errors: array<string>` (empty when the row
      * passes every rule). Rule semantics: a `required` field that is null
      * errors; a null optional field passes; a non-null value failing its
      * `check` errors.
      */
    def validateFields(rules: Seq[FieldRule]): DataFrame = {
      val errors: Seq[Column] = rules.map { r =>
        val c = col(r.field)
        val missing = when(c.isNull && lit(r.required), lit(s"${r.field}: required"))
        r.check match {
          case Some(chk) =>
            missing.otherwise(
              when(c.isNotNull && !chk(c), lit(s"${r.field}: ${r.message}")))
          case None => missing
        }
      }
      df.withColumn(ErrorsColumn, filter(array(errors: _*), _.isNotNull))
    }

    /** Rows that passed (or failed) a prior [[validateFields]]. */
    def validRows: DataFrame = df.filter(size(col(ErrorsColumn)) === 0)
    def invalidRows: DataFrame = df.filter(size(col(ErrorsColumn)) > 0)

    /** V2 — minimum-count monitor (monitors.py:8-17): one action. */
    def assertMinCount(threshold: Long): DataFrame = {
      val n = df.count()
      require(n >= threshold, s"monitor: count $n < threshold $threshold")
      df
    }

    /** V3 — zero-validation-errors monitor (monitors.py:20-31). */
    def assertNoValidationErrors(): DataFrame = {
      val bad = df.filter(size(col(ErrorsColumn)) > 0).count()
      require(bad == 0, s"monitor: $bad rows carry validation errors")
      df
    }
  }
}
