package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Column-level parity operators (SURVEY.md §2.2 P1–P8).
  *
  * Behavioral contract derives from the reference's fluent service
  * (lsom11/etl-projects, etl_projects/base/processors/spark/
  * spark_dataframe_service.py:46-195), re-expressed as extension methods on
  * `DataFrame` composed with `Dataset.transform`. Unlike the reference we
  * never loop `withColumnRenamed`/`withColumn` per column — each operator is
  * a single projection so the analyzed plan stays one `Project` node no
  * matter how wide the schema (matters at 100 TB where thousand-column
  * schemas make N chained projections an analyzer bottleneck).
  */
object ColumnOps {

  /** P1 — snake_case one column name.
    *
    * Pipeline (parity with spark_dataframe_service.py:46-56): space and dot
    * become `_` first, then all remaining non-word chars are stripped (the
    * `_` survives: it is a word char), then `_` is inserted before every
    * capital (a leading capital yields a leading underscore), then
    * lowercased. E.g. "User Name" -> "_user__name", "user.id" -> "user_id",
    * "HTTPStatus" -> "_h_t_t_p_status", "weird$chars!" -> "weirdchars".
    */
  def formatColumnName(name: String): String = {
    val underscored =
      name.replace(" ", "_").replace(".", "_").replaceAll("\\W", "")
    underscored.replaceAll("([A-Z])", "_$1").toLowerCase
  }

  implicit class DataFrameColumnOps(val df: DataFrame) extends AnyVal {

    /** P2 — rename every column to snake_case in one projection. */
    def formatColumnNames(): DataFrame =
      df.toDF(df.columns.map(formatColumnName).toIndexedSeq: _*)

    /** P3 — serialize every StructType column to its JSON text. */
    def convertStructTypeToJson(): DataFrame =
      mapFieldsOfType(_.isInstanceOf[StructType], to_json(_))

    /** P4 — serialize every ArrayType column to its JSON text. */
    def convertArrayTypeToJson(): DataFrame =
      mapFieldsOfType(_.isInstanceOf[ArrayType], to_json(_))

    /** P5 — cast every StructType column with Spark's struct->string
      * rendering (NOT JSON: `{1, x}` rather than `{"a":1,"b":"x"}`),
      * matching the reference's `.cast("string")` variant
      * (spark_dataframe_service.py:97-109).
      */
    def convertStructTypeToString(): DataFrame =
      mapFieldsOfType(_.isInstanceOf[StructType], _.cast(StringType))

    /** Recursively promote nested struct fields to top-level columns
      * named `parent<sep>child<sep>...` — the schema-flattening step
      * between a nested ingest format and a flat warehouse table.
      * Arrays and maps pass through untouched (exploding is a separate,
      * row-multiplying decision — see `JsonOps`), field ORDER follows a
      * depth-first walk of the schema, and a name collision after
      * flattening fails loudly instead of silently shadowing a column.
      * One projection regardless of nesting depth.
      */
    def flattenStructs(sep: String = "_"): DataFrame = {
      def expand(schema: StructType, path: Seq[String],
          prefix: String): Seq[Column] =
        schema.fields.toSeq.flatMap { f =>
          val p = path :+ f.name
          f.dataType match {
            case s: StructType => expand(s, p, prefix + f.name + sep)
            case _ =>
              Seq(col(p.map(n => s"`$n`").mkString("."))
                .as(prefix + f.name))
          }
        }
      val cols = expand(df.schema, Nil, "")
      // collision check over the names the same walk produces
      def namesOf(schema: StructType, prefix: String): Seq[String] =
        schema.fields.toSeq.flatMap { f =>
          f.dataType match {
            case s: StructType => namesOf(s, prefix + f.name + sep)
            case _ => Seq(prefix + f.name)
          }
        }
      val flat = namesOf(df.schema, "")
      require(flat.distinct.size == flat.size,
        s"flattenStructs: name collision after flattening: " +
          flat.diff(flat.distinct).distinct.mkString(", "))
      df.select(cols: _*)
    }

    /** P6 — add constant columns from an ordered name->value list.
      * `Seq` (not `Map`) keeps the reference's OrderedDict column order.
      */
    def createColumnsFromSeq(columns: Seq[(String, Any)]): DataFrame =
      appendColumns(columns.map { case (n, v) => n -> lit(v) })

    /** P7 — derive partition columns year/month/day from a date column. */
    def withYearMonthDayFromColumn(dateColumnName: String): DataFrame =
      appendColumns(Seq(
        "year" -> year(col(dateColumnName)),
        "month" -> month(col(dateColumnName)),
        "day" -> dayofmonth(col(dateColumnName))))

    /** P8 — the same three columns from a literal date (the run date). */
    def withYearMonthDayFromDate(date: LocalDate): DataFrame =
      appendColumns(Seq(
        "year" -> lit(date.getYear),
        "month" -> lit(date.getMonthValue),
        "day" -> lit(date.getDayOfMonth)))

    /** Add named columns in declared order as ONE Project node (N chained
      * `withColumn` calls would stack N projections). Matches
      * `withColumn(s)` semantics on name collision: an existing column of
      * the same name is REPLACED in place, not duplicated (a duplicate
      * would make every later by-name reference ambiguous).
      */
    private def appendColumns(
        columns: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
      val byName = columns.toMap
      val existing = df.columns.toIndexedSeq
      val replaced = existing.map(n =>
        byName.get(n).map(_.as(n)).getOrElse(col(n)))
      val appended = columns.collect {
        case (n, c) if !existing.contains(n) => c.as(n)
      }
      df.select(replaced ++ appended: _*)
    }

    private def mapFieldsOfType(
        pred: org.apache.spark.sql.types.DataType => Boolean,
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val cols = df.schema.fields.map { field =>
        if (pred(field.dataType)) f(col(field.name)).as(field.name)
        else col(field.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }
}
