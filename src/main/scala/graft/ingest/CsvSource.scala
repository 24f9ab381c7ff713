package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.ops.ColumnOps._
import graft.ops.ValidateOps._

/** CSV twin of [[JsonlSource]] — the other landed-feed format a scrape/
  * export pipeline drops (partner exports, warehouse unloads). Same
  * engine-side contract as the JSONL adapter: read the landed file,
  * keep every field a string (the reference's cast-to-string ingestion,
  * here for free — `inferSchema` stays OFF, which at 100 TB also avoids
  * an entire extra pass over the data just to guess types that the
  * downstream contract re-casts anyway), snake_case the names, validate,
  * land raw.
  *
  * Multiline quoted records are NOT enabled by default: multiline CSV
  * makes files unsplittable (one reader per file); a feed that needs it
  * should land through [[readMultiline]] knowingly.
  */
object CsvSource {

  /** Read a headered CSV (optionally .gz) feed, all fields string,
    * names snake_cased. Splittable: no schema inference pass, no
    * multiline mode.
    */
  def read(spark: SparkSession, path: String,
      delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      // all-strings by default when no schema and no inference
      .option("inferSchema", "false")
      .csv(path)
      .formatColumnNames()

  /** Quoted-multiline variant — unsplittable (whole-file tasks); only
    * for feeds that genuinely embed newlines in quoted fields.
    */
  def readMultiline(spark: SparkSession, path: String,
      delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("inferSchema", "false")
      .option("multiLine", "true")
      .csv(path)
      .formatColumnNames()

  /** Read + validate: appends `_validation_errors` per [[ValidateOps]]. */
  def readValidated(spark: SparkSession, path: String,
      rules: Seq[FieldRule]): DataFrame =
    read(spark, path).validateFields(rules)

  /** Land a frame as gzip CSV with header — the raw-layer landing format
    * for tabular exports.
    */
  def writeGzipCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("compression", "gzip")
      .csv(path)
}
