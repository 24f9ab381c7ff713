package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the DW-history counterpart of
  * the staging→final load in [[DwLoad]].
  *
  * The reference's warehouse loads (dw_sub_dag_builder.py:49-112) overwrite
  * the final schema each run, which is type-1 semantics: history is lost.
  * Production dimension tables usually need type 2 — keep every version of
  * a row, with `valid_from`/`valid_to` bounds and an `is_current` flag —
  * and the merge that maintains such a table is a fixed relational recipe,
  * so it belongs in the engine rather than in every pipeline.
  *
  * Semantics of [[Scd2.merge]] for one update batch effective at `asOf`:
  *
  *  - key present in `updates` but not in `current` → insert a new open
  *    version (`valid_from = asOf`, `valid_to = null`, `is_current = true`);
  *  - key present in both and any tracked attribute differs (null-safe
  *    compare) → close the old open version (`valid_to = asOf`,
  *    `is_current = false`) and insert a new open version;
  *  - key present in both and nothing differs → row passes through
  *    untouched (re-delivered batches are idempotent);
  *  - open key absent from `updates` → untouched by default; with
  *    `closeMissing = true` (full-snapshot loads, where absence means
  *    deletion) the open version is closed at `asOf`;
  *  - already-closed history rows are never revisited.
  *
  * Scale shape: closed history never enters a join — it is unioned through
  * untouched, so a 100 TB dimension with years of history only shuffles its
  * OPEN slice (bounded by the entity count, not the version count). The
  * open slice and the batch meet in ONE full-outer equi-join on the key
  * (full-outer is required: new keys live only on the update side, missing
  * keys only on the current side — and it is why this cannot broadcast:
  * Spark has no broadcast full-outer hash join). Each joined row then emits
  * its 1-2 output versions from a single projection through
  * `explode(filter(array(...)))` — one generator, no re-scan of the join
  * output per case, no second shuffle.
  *
  * Precondition: `keys` are unique within `updates` and within the open
  * slice of `current` (standard dimension-merge contract; duplicate update
  * rows for one key would emit conflicting versions).
  */
object Scd2 {

  /** @param current  existing SCD2 table: key cols ++ tracked cols ++
    *                 (`validFrom`, `validTo`, `isCurrent`)
    * @param updates  the new batch: key cols ++ tracked cols only
    * @param keys     business-key column names
    * @param asOf     effective bound for versions opened/closed by this
    *                 batch; cast to the `validFrom` column's type
    * @param broadcastUpdates plan for a SMALL batch against a HUGE
    *                 dimension: the open slice meets the batch in a
    *                 broadcast LEFT-outer join (no shuffle of the open
    *                 slice at all), and brand-new keys are found by a
    *                 separate anti join that shuffles only a keys-only
    *                 projection of the open slice — the dimension's full
    *                 width never crosses the wire. The default full-outer
    *                 plan reads `updates` once and is right when the
    *                 batch is shuffle-scale too.
    */
  def merge(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      asOf: Column,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      isCurrent: String = "is_current",
      closeMissing: Boolean = false,
      broadcastUpdates: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "scd2: at least one key column")
    val tracked = updates.columns.toSeq.filterNot(keys.contains)
    require(tracked.nonEmpty, "scd2: updates carry no tracked attributes")
    val meta = Seq(validFrom, validTo, isCurrent)
    val outCols = keys ++ tracked ++ meta

    val fromType = current.schema(validFrom).dataType
    val toType = current.schema(validTo).dataType
    val ts = asOf.cast(fromType)

    val open = current.filter(col(isCurrent)).select(outCols.map(col): _*)
    val closedHistory =
      current.filter(!col(isCurrent)).select(outCols.map(col): _*)

    // prefix the update side so the join output has unambiguous names
    val uCols = (keys ++ tracked).map(c => col(c).as(s"_u_$c")) :+
      lit(true).as("_has_upd")
    val u0 = updates.select(uCols: _*)
    val u = if (broadcastUpdates) broadcast(u0) else u0
    val o = open.withColumn("_has_cur", lit(true))
    val joinType = if (broadcastUpdates) "left_outer" else "full_outer"
    val joined = o.join(
      u, keys.map(k => o(k) === u(s"_u_$k")).reduce(_ && _), joinType)

    val hasCur = coalesce(col("_has_cur"), lit(false))
    val hasUpd = coalesce(col("_has_upd"), lit(false))
    val changed =
      tracked.map(c => !(col(c) <=> col(s"_u_$c"))).reduce(_ || _)
    val shouldClose =
      (hasUpd && changed) || (!hasUpd && lit(closeMissing))

    def version(
        side: String => Column, vf: Column, vt: Column, cur: Column) =
      struct(
        keys.map(k => side(k).as(k)) ++
          tracked.map(c => side(c).as(c)) ++ Seq(
            vf.as(validFrom), vt.as(validTo), cur.as(isCurrent)): _*)

    val keptOpen = when(hasCur && !shouldClose,
      version(col, col(validFrom), col(validTo), col(isCurrent)))
    val closedNow = when(hasCur && shouldClose,
      version(col, col(validFrom), ts.cast(toType), lit(false)))
    val newOpen = when(hasUpd && (!hasCur || changed),
      version(c => col(s"_u_$c"), ts, lit(null).cast(toType), lit(true)))

    val merged = joined
      .select(explode(filter(
        array(keptOpen, closedNow, newOpen), _.isNotNull)).as("_v"))
      .select(outCols.map(c => col(s"_v.$c")): _*)

    // the left-outer body never sees keys that exist only in the batch;
    // recover them with a keys-only anti join (narrow shuffle of open)
    val withNew =
      if (!broadcastUpdates) merged
      else merged.unionByName(
        updates.join(open.select(keys.map(col): _*), keys, "left_anti")
          .select(keys.map(col) ++ tracked.map(col) ++ Seq(
            ts.as(validFrom), lit(null).cast(toType).as(validTo),
            lit(true).as(isCurrent)): _*))

    withNew.unionByName(closedHistory)
  }

  /** Time-travel read: the version of each entity active at `at` —
    * `valid_from <= at < valid_to` with an open `valid_to` meaning
    * "still active". A pure filter: partition/file pruning on the
    * version bounds applies untouched.
    */
  def asOfView(
      scd2: DataFrame,
      at: Column,
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val t = at.cast(scd2.schema(validFrom).dataType)
    scd2.filter(
      col(validFrom) <= t && (col(validTo).isNull || col(validTo) > t))
  }
}
