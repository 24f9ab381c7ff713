package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep per-group summaries that new
  * data FOLDS INTO, so history is never rescanned.
  *
  * At 100 TB the difference between `GROUP BY` over the full table and
  * folding today's partition into yesterday's summary is the whole
  * batch-window. That works only if every kept statistic is
  * re-aggregatable: counts and sums add, mins/maxes combine, and
  * distinct counts ride DataSketches HLL sketches (`hll_sketch_agg` /
  * `hll_union_agg` — Spark's binary-portable sketch columns), which
  * union losslessly across increments. Average and friends are derived
  * at read time from (sum, count), never stored.
  *
  * [[summarize]] produces the summary of one slice; [[merge]] folds any
  * number of summaries (yesterday's table + today's delta summary —
  * or a year of dailies into a monthly) with ONE groupBy over summary
  * rows, which are O(groups), not O(data); [[estimate]] finalizes
  * sketch columns into readable ndv estimates. merge∘summarize over any
  * partitioning of the data equals summarize of the whole — the
  * invariant the spec and q47's oracle pin.
  */
object IncrementalAgg {

  private def sketchCol(c: String) = s"__ndv_sketch_$c"

  /** Summarize one data slice: `n` rows per group, `sum_<c>` for each of
    * `sumCols`, `min_<c>`/`max_<c>` for each of `rangeCols`, and a
    * mergeable HLL sketch per `ndvCols` entry. One partial-combinable
    * aggregation — the only shuffle is O(groups).
    */
  def summarize(df: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String] = Nil, rangeCols: Seq[String] = Nil,
      ndvCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "summarize needs group columns")
    val aggs =
      count(lit(1)).as("n") +:
        (sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
          rangeCols.flatMap(c => Seq(
            min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
          ndvCols.map(c => hll_sketch_agg(col(c)).as(sketchCol(c))))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold summaries produced by [[summarize]] with the same column spec:
    * counts and sums add, ranges combine, sketches union. Input is
    * summary rows, so this costs O(groups × summaries), independent of
    * the data size the summaries describe.
    */
  def merge(summaries: Seq[DataFrame], groupCols: Seq[String],
      sumCols: Seq[String] = Nil, rangeCols: Seq[String] = Nil,
      ndvCols: Seq[String] = Nil): DataFrame = {
    require(summaries.nonEmpty, "merge needs at least one summary")
    val aggs =
      sum(col("n")).as("n") +:
        (sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
          rangeCols.flatMap(c => Seq(
            min(col(s"min_$c")).as(s"min_$c"),
            max(col(s"max_$c")).as(s"max_$c"))) ++
          ndvCols.map(c => hll_union_agg(col(sketchCol(c))).as(sketchCol(c))))
    summaries.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Finalize a summary for reading: each sketch column becomes a bigint
    * `ndv_<c>` estimate (the sketch itself is dropped).
    */
  def estimate(summary: DataFrame, ndvCols: Seq[String]): DataFrame =
    ndvCols.foldLeft(summary) { (df, c) =>
      df.withColumn(s"ndv_$c", hll_sketch_estimate(col(sketchCol(c))))
        .drop(sketchCol(c))
    }
}
