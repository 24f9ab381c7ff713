package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.ops.PartitionOps._

/** S4 — the partitioned table writer.
  *
  * Parity: `etl_projects/base/loaders/s3_loader.py:15-40` — overwrite mode,
  * `maxRecordsPerFile=250000`, optional Hive-style `partitionBy`, per-layer
  * format options, `save(path)`, then catalog registration (the reference
  * registers an Athena external table via DDL fragments,
  * `etl_projects/base/db/athena/table_storage_format.py:2-6`; here the Spark
  * session catalog plays Athena's role).
  *
  * Scale posture: `maxRecordsPerFile` bounds file size so a 100 TB table
  * lands as uniformly-sized splits; `onePartitionFilePerValue` pre-shuffles
  * by the partition columns so each Hive partition is written by one task
  * (one file) instead of every task appending a sliver to every partition —
  * the small-files problem that kills object-store listings at scale.
  * Incremental loads use dynamic partition overwrite so re-running a day
  * replaces only that day's partitions (SURVEY.md §2.9).
  */
object TableWriter {

  /** Reference default (s3_loader.py:13). */
  final val DefaultMaxRecordsPerFile = 250000L

  final case class Spec(
      layer: Layer,
      path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = DefaultMaxRecordsPerFile,
      onePartitionFilePerValue: Boolean = false,
      dynamicPartitionOverwrite: Boolean = false,
      extraOptions: Map[String, String] = Map.empty,
      /** Interchange override (e.g. [[StorageFormat.orcZstd]]): replaces
        * the layer's format policy for THIS write only — the export path
        * to external warehouse stacks. None = layer policy.
        */
      formatOverride: Option[StorageFormat.Format] = None)

  private def formatFor(spec: Spec): StorageFormat.Format =
    spec.formatOverride.getOrElse(StorageFormat.forLayer(spec.layer))

  def write(df: DataFrame, spec: Spec): Unit = {
    val fmt = formatFor(spec)
    val shaped =
      if (spec.onePartitionFilePerValue && spec.partitionBy.nonEmpty)
        df.optimizePartitionsByPartitionColumns(spec.partitionBy)
      else df

    var writer = shaped.write
      .mode(SaveMode.Overwrite)
      .format(fmt.format)
      .option("maxRecordsPerFile", spec.maxRecordsPerFile)
      .options(fmt.options)
      .options(spec.extraOptions)
    if (spec.dynamicPartitionOverwrite)
      writer = writer.option("partitionOverwriteMode", "dynamic")
    if (spec.partitionBy.nonEmpty)
      writer = writer.partitionBy(spec.partitionBy: _*)
    writer.save(spec.path)
  }

  /** Bucketed external-table write (beyond-reference layout operator, the
    * key to exchange-free joins at 100 TB): rows are hash-partitioned into
    * `numBuckets` files per partition by `bucketCols` AT WRITE TIME, so any
    * later equi-join or aggregation on those columns between tables with
    * the same bucketing reads co-located data and skips the shuffle
    * entirely — the single biggest repeated-query win for large fact-fact
    * joins. `sortCols` additionally pre-sorts within buckets (sort-merge
    * joins then skip the sort too). Bucketing rides the catalog
    * (`saveAsTable` + `path` = external), not a bare directory — bucket
    * metadata lives in the table definition.
    */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      database: String,
      table: String,
      path: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: bucketCols must be non-empty")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    spark.sql(s"DROP TABLE IF EXISTS `$database`.`$table`")
    var writer = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("compression", "snappy")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty)
      writer = writer.sortBy(sortCols.head, sortCols.tail: _*)
    writer.saveAsTable(s"`$database`.`$table`")
  }

  /** S6 — register the written location as an external table in the session
    * catalog (the sandbox stand-in for the reference's
    * `create_external_table.py` Athena registration).
    */
  def registerExternalTable(
      spark: SparkSession,
      database: String,
      table: String,
      spec: Spec,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val fmt = formatFor(spec)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    spark.sql(s"DROP TABLE IF EXISTS `$database`.`$table`")
    // Spark requires an explicit column list when PARTITIONED BY names
    // partition columns ([SPECIFY_PARTITION_IS_NOT_ALLOWED]). Callers that
    // just wrote the table KNOW the schema — pass it and registration is a
    // pure metadata operation. The fallback reads it back from the written
    // location: cheap for parquet (footers), but a full inference SCAN for
    // the JSON raw layer — avoid there.
    val ddlSchema = schema.getOrElse(
      spark.read.format(fmt.format).load(spec.path).schema)
    val ddlColumns = ddlSchema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}")
      .mkString(", ")
    val partClause =
      if (spec.partitionBy.nonEmpty)
        spec.partitionBy.mkString(" PARTITIONED BY (`", "`, `", "`)")
      else ""
    spark.sql(
      s"CREATE TABLE `$database`.`$table` ($ddlColumns) " +
        s"USING ${fmt.format}$partClause LOCATION '${spec.path}'")
    if (spec.partitionBy.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE `$database`.`$table`")
  }
}
