package graft.ops

import org.apache.spark.sql.DataFrame
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
  * phase means, and two broadcast joins to attach them — the series rows
  * shuffle once, by key. The caller owns the series' regularity: `idxCol`
  * must be the 0-based consecutive ordinal within each key (build it with
  * `row_number` over the bucketed series, as q90 does); the window is
  * row-based, so a gap in ordinals is the caller's modeling decision, not
  * a silent skip.
  */
object Seasonal {

  def decompose(
      df: DataFrame,
      keyCol: String,
      idxCol: String,
      valCol: String,
      period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val h = period / 2
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
      trend.as("trend"), pmod(col(idxCol), lit(period)).as("phase"))
    val phaseMeans = base
      .filter(col("trend").isNotNull)
      .groupBy(keyCol, "phase")
      .agg(avg(col(valCol) - col("trend")).as("_sraw"))
    val keyMeans = phaseMeans.groupBy(keyCol)
      .agg(avg("_sraw").as("_smean"))
    base
      .join(broadcast(phaseMeans), Seq(keyCol, "phase"), "left")
      .join(broadcast(keyMeans), Seq(keyCol), "left")
      .withColumn("seasonal", col("_sraw") - col("_smean"))
      .withColumn("residual",
        col(valCol) - col("trend") - col("seasonal"))
      .select(col(keyCol), col(idxCol), col(valCol),
        col("trend"), col("seasonal"), col("residual"))
  }
}
