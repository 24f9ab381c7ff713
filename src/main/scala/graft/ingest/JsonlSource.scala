package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.ops.ColumnOps._
import graft.ops.ValidateOps._

/** S8/S9 — the ingestion adapter for scraped/landed JSONL feeds.
  *
  * The reference's ingestion path is a Scrapy+Selenium spider
  * (etl_projects/scrapers/spiders/yahoo_finance.py:26-99) whose items are
  * string-cast (pipelines.py:9-17), schematics-validated (validators.py:
  * 5-13) and exported as gzip JSONL (exporters.py:6-30). The browser hop is
  * out-of-engine I/O; the engine-side contract starts at the landed
  * `.jl(.gz)` feed: read JSON lines, cast all fields to string (CastToStr
  * parity), normalize names, validate, land in the raw layer.
  */
object JsonlSource {

  /** Read a JSONL (optionally .gz — Hadoop handles the codec by extension)
    * feed. All fields cast to string to match the reference's ingestion
    * pipeline; names snake_cased.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    raw
      .select(raw.columns.map(c => col(c).cast(StringType).as(c)).toIndexedSeq: _*)
      .formatColumnNames()
  }

  /** Read + validate: appends `_validation_errors` per [[ValidateOps]]. */
  def readValidated(
      spark: SparkSession,
      path: String,
      rules: Seq[FieldRule]): DataFrame =
    read(spark, path).validateFields(rules)

  /** S9 — land a feed as gzip JSONL (the raw-layer landing format). */
  def writeGzipJsonl(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("json")
      .option("compression", "gzip")
      .save(path)
}
