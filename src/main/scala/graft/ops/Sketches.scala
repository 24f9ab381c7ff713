package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-level distinct-count sketches (Apache DataSketches HLL via
  * Spark's `hll_sketch_agg` family) — the pre-aggregation pattern that
  * makes "how many distinct users/docs/keys" answerable at 100 TB without
  * rescanning: each partition/day/source folds to an O(2^lgK)-byte binary
  * sketch ONCE, the sketch table persists like any other (parquet binary
  * column), and any later rollup — per source, per month, global — is a
  * union of sketches, never a second pass over the data. Exact
  * `count(DISTINCT)` can't do this: distinct counts don't add, sketches
  * do.
  */
object Sketches {

  /** One HLL sketch + row count per segment (`segmentCols` combination).
    * The segment grain is the finest rollup you'll ever need — sketches
    * union upward but never split. `lgK` trades size for accuracy
    * (default 12 ≈ 2.5 KB per segment, ~1.6% standard error).
    */
  def buildSegmentSketches(
      df: DataFrame,
      segmentCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(segmentCols.nonEmpty, "buildSegmentSketches: no segment columns")
    require(lgK >= 4 && lgK <= 21, s"lgK out of 4..21: $lgK")
    df.groupBy(segmentCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Roll segment sketches up to `groupCols` (empty = one global row):
    * `ndv_est` is the unioned estimate, `n_rows` the exact row sum — their
    * ratio is the duplication factor without touching the raw data.
    */
  def estimateDistinct(
      sketches: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val aggs = Seq(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("ndv_est"),
      sum("n_rows").as("n_rows"))
    if (groupCols.isEmpty) sketches.agg(aggs.head, aggs.tail: _*)
    else sketches.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One GK quantile sketch + row count per segment — the quantile
    * sibling of [[buildSegmentSketches]] (see
    * [[graft.functions.QuantileSketchCodec]]): per-segment rank error ≤
    * `relativeError · n`, O(1/ε · log εn) bytes, persistable, mergeable.
    */
  def buildQuantileSketches(
      df: DataFrame,
      segmentCols: Seq[String],
      valueCol: String,
      relativeError: Double = 0.01): DataFrame = {
    require(segmentCols.nonEmpty, "buildQuantileSketches: no segment columns")
    df.groupBy(segmentCols.map(col): _*)
      .agg(graft.functions.QuantileFunctions
        .quantileSketch(col(valueCol), relativeError).as("qsketch"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Roll quantile sketches up to `groupCols` (empty = one global row)
    * and probe the merged summary at `probs`: `quantiles` is an
    * `array<double>` aligned with `probs`, `n_rows` the exact row sum.
    * Rank error after one merge level stays ≤ 2 · relativeError · n.
    */
  def estimateQuantiles(
      sketches: DataFrame,
      groupCols: Seq[String],
      probs: Seq[Double],
      relativeError: Double = 0.01): DataFrame = {
    val aggs = Seq(
      graft.functions.QuantileFunctions
        .quantileSketchMerge(col("qsketch"), relativeError).as("_m"),
      sum("n_rows").as("n_rows"))
    val merged =
      if (groupCols.isEmpty) sketches.agg(aggs.head, aggs.tail: _*)
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    merged.select(groupCols.map(col) ++ Seq(
      graft.functions.QuantileFunctions
        .quantileSketchGet(col("_m"), probs).as("quantiles"),
      col("n_rows")): _*)
  }
}
