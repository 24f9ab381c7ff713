package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.Row

/** Structured Streaming extension (SURVEY.md §2.9 declares the reference
  * batch-only; this module is the engine's declared extension beyond
  * parity): the same event pipeline shapes as the batch operators, expressed
  * as incremental plans over `readStream` sources.
  *
  * Design notes for the 100 TB/day shape:
  *  - all transforms are the SAME declarative DataFrame expressions the
  *    batch path uses — one definition, two execution modes (the point of
  *    Structured Streaming);
  *  - watermarks bound state: the windowed aggregation keeps only windows
  *    newer than the watermark, so state size is O(keys × windows-in-
  *    horizon), not O(stream);
  *  - file sinks are exactly-once via the sink's commit log; `append` mode
  *    emits each window once, when it finalizes;
  *  - `availableNow` triggers turn the same query into an incremental
  *    batch job (the reference's `is_incremental` semantics without a
  *    scheduler).
  */
object EventStream {

  /** Landed-JSONL streaming source: the streaming twin of
    * [[graft.ingest.JsonlSource.read]] (schema must be declared — streaming
    * sources cannot infer).
    */
  def readJsonlStream(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Tumbling-window event counts/sums per event type with a watermark.
    *
    * @param lateness how late an event may arrive and still be counted
    *                 (also bounds the aggregation state horizon).
    */
  def windowedEventAgg(
      events: DataFrame,
      tsCol: String,
      window: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming dedup on a fingerprint with watermark-bounded state — the
    * streaming twin of [[graft.ext.Dedup.dedupExact]]: keeps the first
    * arrival per content fingerprint.
    */
  def dedupStream(
      events: DataFrame, textCol: String, tsCol: String,
      lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("_fp", graft.ext.Dedup.exactFingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Parquet sink into a lake layer path, checkpointed; exactly-once via
    * the file-sink commit log. Caller `.start()`s (and picks a trigger —
    * `Trigger.AvailableNow()` for incremental-batch semantics).
    */
  def parquetSink(
      df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)

  /** One-shot incremental run: process exactly the data available now and
    * stop — the scheduler-free equivalent of the reference's incremental
    * load flag.
    */
  def runAvailableNow(
      df: DataFrame, path: String, checkpoint: String): Unit = {
    val q = parquetSink(df, path, checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
