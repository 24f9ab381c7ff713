package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-funnel analysis: per entity, how far through an ordered stage
  * sequence its event stream progressed, with an overall completion
  * window.
  *
  * Semantics are the deterministic "chain of minima": stage 1's timestamp
  * is the entity's earliest stage-1 event; stage i+1's is its earliest
  * stage-(i+1) event STRICTLY after stage i's. `completed` additionally
  * requires the whole chain to fit inside `windowMicros` of stage 1. A
  * single sorted scan per entity computes exactly that chain (the first
  * qualifying event a greedy in-order walk accepts for stage i+1 IS the
  * minimum above stage i), which is what lets the q55 oracle re-derive
  * the result as a join chain of `min()` aggregations.
  *
  * 100 TB shape: one filter to the funnel's event types (pushed to the
  * scan), then ONE shuffle to group by entity; per-entity state is the
  * collected funnel-type events — bounded by the funnel horizon, not the
  * corpus (pre-filter the time range for unbounded retention). The fold
  * over each entity's sorted events runs in Spark's higher-order-function
  * path; it touches only the grouped arrays, never a second shuffle.
  *
  * Reference context: the reference's event pipelines stop at windowed
  * counts (`etl-projects` event aggregations); ordered-sequence conversion
  * is the standard product-analytics extension of that surface.
  */
object Funnel {

  /** Per-entity funnel progress over `stages` (2..8 event types, in
    * order). Output: `userCol`, `stages_completed` INT, `ts_1..ts_n`
    * BIGINT epoch-microseconds (null where unreached), `completed`
    * BOOLEAN (all stages reached and `ts_n - ts_1 <= windowMicros`).
    * Entities with no funnel-type events at all do not appear.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      windowMicros: Long): DataFrame = {
    require(stages.size >= 2 && stages.size <= 8,
      s"funnel needs 2..8 stages, got ${stages.size}")
    require(windowMicros > 0, "funnel window must be positive")
    val n = stages.size
    val stagesSql = stages
      .map(s => "'" + s.replace("'", "''") + "'")
      .mkString("array(", ", ", ")")
    // greedy in-order walk == chain of minima (see scaladoc): accept an
    // event iff it is the next expected stage and strictly after the
    // previous stage's accepted timestamp
    val fold =
      s"""aggregate(evs, cast(array() as array<bigint>),
         |  (acc, e) -> IF(size(acc) < $n
         |      AND e.tpe = element_at($stagesSql, size(acc) + 1)
         |      AND (size(acc) = 0 OR e.ts > element_at(acc, size(acc))),
         |    concat(acc, array(e.ts)), acc))""".stripMargin
    val tsCols = (1 to n).map(i =>
      when(size(col("chain")) >= i, element_at(col("chain"), i))
        .as(s"ts_$i"))
    events
      .where(col(typeCol).isin(stages: _*))
      // cast covers TIMESTAMP_NTZ inputs (parquet without tz annotation);
      // sessions here run UTC, where the cast is value-identity
      .select(col(userCol), unix_micros(col(tsCol).cast("timestamp")).as("ts"),
        col(typeCol).as("tpe"))
      .groupBy(userCol)
      .agg(sort_array(collect_list(struct(col("ts"), col("tpe")))).as("evs"))
      .withColumn("chain", expr(fold))
      .select(
        Seq(col(userCol),
          size(col("chain")).cast("int").as("stages_completed")) ++
        tsCols: _*)
      // ts_n is non-null exactly when the full chain was reached, and
      // null propagation makes the window test null → not completed
      .withColumn("completed",
        coalesce(col(s"ts_$n") - col("ts_1") <= windowMicros, lit(false)))
  }

  /** First-order transition matrix of the event flow: for each observed
    * `(from_state, to_state)` pair of CONSECUTIVE events within an
    * entity's timeline, the transition count and the share of all
    * transitions leaving `from_state` (each from-state's shares sum
    * to 1) — the Markov view of user journeys that funnels summarize
    * and product analytics drill into.
    *
    * One window partitioned by the entity (ordered by time with a
    * unique tie-break, so the sequence is total and engine-stable) for
    * the `lead`, one mergeable grouped count, then an O(states)
    * broadcast of per-from-state totals. The event stream shuffles once,
    * by entity.
    */
  def transitions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      stateCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(tsCol, tieCol)
    val pairs = df
      .withColumn("_to", lead(col(stateCol), 1).over(w))
      .filter(col("_to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("_to").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy("from_state")
      .agg(sum("n").as("_out"))
    pairs.join(broadcast(outTotals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        (floor(col("n").cast("double") / col("_out") * 1e6 + 0.5) / 1e6)
          .as("share"))
  }
}
