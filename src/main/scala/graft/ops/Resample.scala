package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a fixed grid with forward fill — the
  * feature-engineering step that turns irregular event streams into the
  * aligned per-entity series a model or monitor consumes (pandas'
  * `resample().last().ffill()`, as one distributed plan).
  *
  * Scale shape: one grouped aggregation onto `(key, slot)` (mergeable,
  * map-side partials), one O(keys) span aggregation, a narrow
  * `sequence`-explode building each key's slot spine, a left join back on
  * `(key, slot)`, and a per-key ordered window for the fill — every stage
  * partitions by key (or finer), so 100 TB of events distribute across
  * however many entities exist. The spine explode is guarded: a key whose
  * span/step exceeds `maxSlotsPerKey` fails loudly instead of silently
  * materializing a billion-row spine for one degenerate entity.
  */
object Resample {

  /** Resample `valCol` onto a `stepSeconds` grid per `keyCol`:
    * one row per `(key, slot)` from the key's first observed slot to its
    * last, `value_filled` = the value of the slot's LAST event (ordered by
    * event time, tie-broken by `tieCol`) carried forward across empty
    * slots, `n_events` = events landing in the slot. Rows with null
    * `valCol` are ignored entirely (they neither fill nor count). Slots
    * are epoch-second longs (`floor(epoch / step) * step`) — formatting is
    * the caller's concern.
    */
  def resampleLastFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      tieCol: String,
      stepSeconds: Long,
      maxSlotsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1: $stepSeconds")
    require(maxSlotsPerKey >= 1, s"maxSlotsPerKey must be >= 1")
    val slot =
      (floor(unix_timestamp(col(tsCol)).cast("double") / stepSeconds)
        .cast("long") * stepSeconds).as("slot")
    val perSlot = df
      .filter(col(valCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), slot,
        struct(col(tsCol), col(tieCol), col(valCol).as("v")).as("s"))
      .groupBy(col(keyCol), col("slot"))
      .agg(max(col("s")).getField("v").as("v_last"),
        count(lit(1)).as("n_events"))
    val spine = perSlot
      .groupBy(col(keyCol))
      .agg(min("slot").as("t0"), max("slot").as("t1"))
      .withColumn("_slots", (col("t1") - col("t0")) / stepSeconds + 1)
      // the guard lives in a FILTER predicate (not an unused projection a
      // column-pruning pass would silently drop): an oversized key raises
      // before its spine can explode
      .filter(
        when(col("_slots") > maxSlotsPerKey,
          raise_error(concat(lit("resampleLastFill: key "),
            col(keyCol).cast("string"),
            lit(s" spans more than $maxSlotsPerKey slots")))
            .isNull)
          .otherwise(lit(true)))
      .select(col(keyCol),
        explode(sequence(col("t0"), col("t1"), lit(stepSeconds)))
          .as("slot"))
    spine.join(perSlot, Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("slot"),
        last(col("v_last"), ignoreNulls = true)
          .over(Window.partitionBy(keyCol).orderBy("slot")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value_filled"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }
}
