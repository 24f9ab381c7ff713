package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust numeric normalization for feature preparation — the clip step
  * that keeps a handful of sensor glitches or log-scale outliers from
  * dominating a model's input range. Kept separate from
  * [[Profile.robustOutliers]] (which FLAGS anomalies): winsorization
  * re-shapes every row and is usually applied after outlier triage.
  */
object Normalize {

  /** Per-group winsorization: clip `valCol` to its group's
    * `[lo, hi]` quantiles. Output keeps every input row and adds
    * `p_lo` / `p_hi` (the group's clip bounds, rounded to 6 decimals so
    * they are engine-stable) and `value_w` (the clipped value —
    * untouched rows pass through exactly, clipped rows take the rounded
    * bound).
    *
    * 100 TB shape: ONE grouped aggregation computes both quantiles
    * (mergeable `approx_percentile` sketch by default; `exact = true`
    * for the oracle regime), the O(groups) bounds broadcast back, and
    * the clip is a pure projection — the data shuffles zero times.
    */
  def winsorize(
      df: DataFrame,
      keyCols: Seq[String],
      valCol: String,
      lo: Double = 0.01,
      hi: Double = 0.99,
      exact: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "winsorize: at least one key column")
    require(lo >= 0 && hi <= 1 && lo < hi, s"winsorize: bad range [$lo, $hi]")
    val pct = if (exact) "percentile" else "approx_percentile"
    def rnd6(c: org.apache.spark.sql.Column) =
      floor(c * 1e6 + 0.5) / 1e6
    val bounds = df.groupBy(keyCols.map(col): _*)
      .agg(rnd6(expr(s"$pct($valCol, $lo)")).as("p_lo"),
        rnd6(expr(s"$pct($valCol, $hi)")).as("p_hi"))
    df.join(broadcast(bounds), keyCols)
      .withColumn("value_w",
        when(col(valCol) < col("p_lo"), col("p_lo"))
          .when(col(valCol) > col("p_hi"), col("p_hi"))
          .otherwise(col(valCol)))
  }
}
