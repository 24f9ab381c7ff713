package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition `y = trend + seasonal +
  * residual` — the monitoring primitive that separates "traffic grows"
  * from "it's always quiet on Sunday" from "something broke": alert on
  * the residual and both calendar effects stop paging.
  *
  * Standard construction (the `decompose(..., model="additive")`
  * textbook form): trend = centered moving average of window `period`
  * (the 2×m convention for even periods — half weight on both edge
  * lags), seasonal = per-phase mean of the detrended series re-centered
  * to sum to zero over one period, residual = what remains. Rows whose
  * centered window is incomplete (the first/last half-period) get null
  * trend and residual, never a degraded estimate.
  *
  * Scale shape: one per-key ordered window for the moving average
  * (state = one window frame), one O(keys × period) aggregation for the
  * phase means, and two joins to attach them — the series rows shuffle
  * once, by key. The phase/key-mean joins are broadcast-hinted only when
  * the CALLER declares the key cardinality (`keyCountHint`) and
  * `keys × period` fits under `maxBroadcastCells`; with no hint the plan
  * stays unhinted and AQE picks broadcast vs shuffle from the runtime
  * size — plan construction never runs a job (an earlier gate ran an
  * eager `approx_count_distinct` scan inside the builder, a surprising
  * side effect for a plan-building API). Past the gate a
  * high-cardinality key column costs a (cheap — the rows are already
  * key-partitioned) sort-merge instead of a driver OOM.
  * The caller owns the series' regularity: `idxCol`
  * must be the 0-based consecutive ordinal within each key (build it with
  * `row_number` over the bucketed series, as q90 does); the window is
  * row-based, so a gap in ordinals is the caller's modeling decision, not
  * a silent skip.
  *
  * `roundDigits`: when set, trend and the phase/key means are snapped to
  * the 10^-d grid (the floor-half-up form [[graft.ext.Clustering]] uses)
  * so an independent engine replaying the construction from the same
  * grid-aligned inputs reproduces every output bit-for-bit — float
  * summation order (segment trees vs running frames) otherwise leaks
  * last-ulp noise into round-half boundaries. None (default) keeps full
  * double precision.
  */
object Seasonal {

  def decompose(
      df: DataFrame,
      keyCol: String,
      idxCol: String,
      valCol: String,
      period: Int,
      roundDigits: Option[Int] = None,
      maxBroadcastCells: Long = 1000000L,
      keyCountHint: Option[Long] = None): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val h = period / 2
    def snap(c: Column): Column = roundDigits match {
      case Some(d) =>
        val p = math.pow(10, d)
        floor(c * p + 0.5) / p
      case None => c
    }
    val wk = Window.partitionBy(keyCol).orderBy(idxCol)
    val wFull = wk.rowsBetween(-h, h)
    val trend =
      if (period % 2 == 0)
        when(count(lit(1)).over(wFull) === period + 1,
          (sum(col(valCol)).over(wFull) -
            (lag(col(valCol), h).over(wk) + lead(col(valCol), h).over(wk)) / 2)
            / period)
      else
        when(count(lit(1)).over(wFull) === period,
          sum(col(valCol)).over(wFull) / period)
    val base = df.select(col(keyCol), col(idxCol), col(valCol),
      snap(trend).as("trend"), pmod(col(idxCol), lit(period)).as("phase"))
    val phaseMeans = base
      .filter(col("trend").isNotNull)
      .groupBy(keyCol, "phase")
      .agg(snap(avg(col(valCol) - col("trend"))).as("_sraw"))
    val keyMeans = phaseMeans.groupBy(keyCol)
      .agg(snap(avg("_sraw")).as("_smean"))
    // O(keys × period) sides: broadcast-hinted only when the caller
    // DECLARED the key cardinality and it fits under the cell gate; with
    // no hint AQE sizes the built side at runtime. Never a builder-time
    // job.
    val hint: DataFrame => DataFrame = keyCountHint match {
      case Some(kEst) if kEst * period <= maxBroadcastCells => broadcast
      case _ => identity
    }
    base
      .join(hint(phaseMeans), Seq(keyCol, "phase"), "left")
      .join(hint(keyMeans), Seq(keyCol), "left")
      .withColumn("seasonal", col("_sraw") - col("_smean"))
      .withColumn("residual",
        col(valCol) - col("trend") - col("seasonal"))
      .select(col(keyCol), col(idxCol), col(valCol),
        col("trend"), col("seasonal"), col("residual"))
  }

  /** Seasonal-aware anomaly flags — the reason pipelines run the
    * decomposition at all: alerting on the RESIDUAL separates "something
    * broke" from daily rhythm and long-term growth, which raw-value
    * thresholds conflate. Adds `z` (residual / per-key sample stddev of
    * residuals) and `is_anomaly` (`|z| > zThreshold`) to [[decompose]]'s
    * output; rows with null residual (the incomplete first/last
    * half-period) carry null z and false.
    *
    * The stddev is ONE unbounded per-key window over the decomposed frame
    * (`stddev_samp(residual) over (partition by key)` — nulls ignored),
    * not an aggregate-plus-self-join: the join form executed the whole
    * decomposition plan twice (once for the stats side, once for the
    * probe side), doubling every upstream scan at corpus scale; the
    * window reuses the rows exactly where the decomposition's own
    * key-partitioned shuffle left them — zero extra exchanges, zero
    * re-execution. A key whose residuals are CONSTANT has sample stddev
    * 0; z divides by `nullif(sd, 0)` so both ANSI Spark and IEEE engines
    * agree on null z / false flag for that degenerate series (a bare
    * division yields ±inf under IEEE and a query failure under ANSI).
    * With `roundDigits` set, the stddev and z snap to the same grid as
    * the decomposition, so both the flag and the score are engine-exactly
    * reproducible — a z sitting ON the threshold compares identically
    * everywhere.
    */
  def anomalies(
      df: DataFrame,
      keyCol: String,
      idxCol: String,
      valCol: String,
      period: Int,
      zThreshold: Double = 3.0,
      roundDigits: Option[Int] = None,
      maxBroadcastCells: Long = 1000000L,
      keyCountHint: Option[Long] = None): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be > 0, got $zThreshold")
    def snap(c: Column): Column = roundDigits match {
      case Some(d) =>
        val p = math.pow(10, d)
        floor(c * p + 0.5) / p
      case None => c
    }
    val dec = decompose(df, keyCol, idxCol, valCol, period, roundDigits,
      maxBroadcastCells, keyCountHint)
    val sd = snap(stddev_samp(col("residual"))
      .over(Window.partitionBy(keyCol)))
    dec
      .withColumn("z", snap(col("residual") / nullif(sd, lit(0d))))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(col(keyCol), col(idxCol), col(valCol), col("trend"),
        col("seasonal"), col("residual"), col("z"), col("is_anomaly"))
  }
}
