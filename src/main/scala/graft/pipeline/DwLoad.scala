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
      minCount: Long = 0L,
      // when set, step 4 ALSO lands the final rows in this JDBC warehouse
      // (the Redshift-copy parity path); the catalog registration still
      // happens so lake-side readers see the same table
      jdbcUrl: Option[String] = None)

  /** Step 4 as a REAL warehouse copy: land the final-schema rows in a
    * JDBC database. This is the reference's Redshift `COPY`
    * (dw_sub_dag_builder.py:93-108) re-expressed as Spark's JDBC batch
    * writer — every executor opens its own connection and streams its
    * partition (`batchsize` rows per round trip), so the copy distributes
    * exactly like the parquet write; the driver never materializes the
    * table. `numPartitions` caps writer-side connections: a 1000-task
    * write would otherwise open 1000 simultaneous connections against a
    * warehouse that typically admits far fewer.
    *
    * Overwrite mode truncates-or-recreates then inserts, keeping the
    * re-run idempotence every other sink in this pipeline has.
    */
  def toJdbc(
      df: DataFrame,
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties(),
      numPartitions: Int = 8,
      batchSize: Int = 10000): Unit =
    df.coalesce(numPartitions) // cap warehouse connections, not a shuffle
      .write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .options(scala.jdk.CollectionConverters.PropertiesHasAsScala(properties)
        .asScala.toMap)
      .mode("overwrite")
      .save()

  /** Read a warehouse table back (round-trip verification / reverse ETL). */
  def fromJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, properties)

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

    // 4. "COPY": register the final-schema files in the warehouse catalog,
    // and when a JDBC url is configured, stream them into the warehouse too
    TableWriter.registerExternalTable(spark, finalDb, spec.table, finalSpec,
      schema = Some(stagedBack.schema))
    spec.jdbcUrl.foreach(url =>
      toJdbc(stagedBack, url, s"${spec.schema}_${spec.table}"))
    spark.table(s"`$finalDb`.`${spec.table}`")
  }
}
