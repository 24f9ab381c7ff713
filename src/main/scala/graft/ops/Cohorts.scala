package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the "of users first seen in period P, how many came
  * back k periods later" triangle that product and data-quality
  * dashboards are built on. All-integer period arithmetic (epoch-second
  * floor division) so every cell is engine-exact.
  */
object Cohorts {

  /** Retention counts per `(cohort_period, period_offset)`:
    * `cohort_period` is the floor-division period of the entity's FIRST
    * event, `period_offset` ≥ 0 counts periods since, `n_active` is the
    * number of distinct entities from that cohort active at that offset
    * (offset 0 = the cohort's size, since the first event itself is
    * activity).
    *
    * Plan: one mergeable min-aggregation finds each entity's first
    * period, joins back on the entity key (the one shuffle the data
    * pays), then one grouped distinct count over O(cohorts × offsets)
    * cells. Periods are `floor(epoch / periodSeconds)` longs —
    * formatting is the caller's concern.
    */
  def retention(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      periodSeconds: Long = 604800L): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1")
    val period =
      floor(unix_timestamp(col(tsCol)).cast("double") / periodSeconds)
        .cast("long")
    val events = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("_k"), period.as("_p"))
    val firsts = events.groupBy("_k").agg(min("_p").as("_p0"))
    events.join(firsts, Seq("_k"))
      .groupBy(col("_p0").as("cohort_period"),
        (col("_p") - col("_p0")).as("period_offset"))
      .agg(count_distinct(col("_k")).as("n_active"))
  }
}
