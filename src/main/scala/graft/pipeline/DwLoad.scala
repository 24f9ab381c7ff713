package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.{Layer, Metastore, TableWriter}
import graft.ops.ValidateOps._

/** §2.1 S10 — the DW sub-DAG collapsed in-process.
  *
  * Parity: dw_sub_dag_builder.py:49-112 sequences four remote tasks per
  * table: load into the staging schema, `validate_entity` quality checks,
  * load staging → final schema, and a Redshift `COPY` of the final-schema
  * files. Here the same sequence is function composition:
  *
  *  1. run the staging SQL against the session catalog → `dw_{schema}_staging`;
  *  2. validate: field rules + min-count + zero-errors monitors
  *     (validators.py / monitors.py semantics) — a failed monitor aborts the
  *     load before anything reaches the final schema, like the DAG edge;
  *  3. load staging → final `dw_{schema}`;
  *  4. the Redshift copy maps to the final table's catalog registration
  *     (SURVEY.md §2.1: external systems are out of sandbox scope; the
  *     catalog plays the warehouse's role — swap step 4 for
  *     `df.write.format("jdbc")` against a real cluster and nothing
  *     upstream moves).
  */
object DwLoad {

  final case class Spec(
      schema: String,
      table: String,
      stagingQuery: String,
      rules: Seq[FieldRule] = Nil,
      minCount: Long = 0L)

  /** Run one DW table load; returns the final-schema DataFrame. */
  def run(spark: SparkSession, metastore: Metastore, spec: Spec): DataFrame = {
    val stagingDb = metastore.dwDatabase(spec.schema, staging = true)
    val finalDb = metastore.dwDatabase(spec.schema)

    // 1. staging load (dw_staging layer format: parquet)
    val staged = spark.sql(spec.stagingQuery)
    val stagingSpec = TableWriter.Spec(
      layer = Layer.DwStaging,
      path = metastore.tablePath(Layer.DwStaging, spec.schema, spec.table))
    TableWriter.write(staged, stagingSpec)
    TableWriter.registerExternalTable(spark, stagingDb, spec.table, stagingSpec,
      schema = Some(staged.schema))

    // 2. validate_entity on the STAGED table (what actually landed)
    val stagedBack = spark.table(s"`$stagingDb`.`${spec.table}`")
    val validated =
      if (spec.rules.nonEmpty) stagedBack.validateFields(spec.rules)
      else stagedBack
    if (spec.minCount > 0L) validated.assertMinCount(spec.minCount)
    if (spec.rules.nonEmpty) validated.assertNoValidationErrors()

    // 3. staging -> final schema
    val finalSpec = TableWriter.Spec(
      layer = Layer.Dw,
      path = metastore.tablePath(Layer.Dw, spec.schema, spec.table))
    TableWriter.write(stagedBack, finalSpec)

    // 4. "COPY": register the final-schema files in the warehouse catalog
    TableWriter.registerExternalTable(spark, finalDb, spec.table, finalSpec,
      schema = Some(stagedBack.schema))
    spark.table(s"`$finalDb`.`${spec.table}`")
  }
}
