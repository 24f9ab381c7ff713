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
  * once, by key. The phase/key-mean joins broadcast only when the
  * estimated `keys × period` cell count is under `maxBroadcastCells`
  * (one cheap `approx_count_distinct` scan decides); past the gate they
  * degrade to shuffle joins, so a high-cardinality key column costs a
  * (cheap — the rows are already key-partitioned) sort-merge instead of
  * a driver OOM. The caller owns the series' regularity: `idxCol`
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
      maxBroadcastCells: Long = 1000000L): DataFrame = {
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
    // O(keys × period) sides: broadcast only under the cell gate; above
    // it AQE/sort-merge takes over (rows already shuffled by key).
    val keyEst = df.select(
      approx_count_distinct(col(keyCol)).as("k")).head.getLong(0)
    val hint: DataFrame => DataFrame =
      if (keyEst * period <= maxBroadcastCells) broadcast else identity
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
    * One extra O(keys) aggregation over the decomposed frame; the stddev
    * attaches under the same broadcast-vs-cardinality discipline (no
    * forced hint — O(keys) rows, AQE broadcasts when small). With
    * `roundDigits` set, the stddev and z snap to the same grid as the
    * decomposition, so both the flag and the score are engine-exactly
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
      maxBroadcastCells: Long = 1000000L): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be > 0, got $zThreshold")
    def snap(c: Column): Column = roundDigits match {
      case Some(d) =>
        val p = math.pow(10, d)
        floor(c * p + 0.5) / p
      case None => c
    }
    val dec = decompose(df, keyCol, idxCol, valCol, period, roundDigits,
      maxBroadcastCells)
    val sds = dec.filter(col("residual").isNotNull)
      .groupBy(keyCol)
      .agg(snap(stddev_samp(col("residual"))).as("_sd"))
    dec.join(sds, Seq(keyCol), "left")
      .withColumn("z", snap(col("residual") / col("_sd")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(col(keyCol), col(idxCol), col(valCol), col("trend"),
        col("seasonal"), col("residual"), col("z"), col("is_anomaly"))
  }
}
