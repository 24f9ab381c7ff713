package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the "what changed between loads" primitive behind
  * incremental publication, CDC backfill validation, and audit trails
  * (reference analogue: the staging-vs-final reconciliation step of
  * `databricks_plugin.py`'s table loads, which re-reads both sides to
  * decide whether a load may commit).
  *
  * Emits ONLY the delta — `added` / `removed` / `changed` rows with the
  * list of differing columns — never the unchanged bulk, because at
  * 100 TB the delta is what ships downstream while unchanged rows are
  * pure shuffle waste. Plan: both sides are column-pruned to
  * key + compared columns before ONE full-outer shuffle join on the key
  * (co-partitioned/bucketed snapshots make even that exchange-free); the
  * per-column comparison is a codegen'd null-safe equality, no UDFs.
  */
object Diff {

  /** Row-level diff of `next` vs `base` keyed by `keyCols`.
    *
    * Output: key columns, `change` ∈ {`added`, `removed`, `changed`}, and
    * `changed_cols` — the compared columns whose values differ (null-safe:
    * null→value and value→null both count), in `compareCols` order; empty
    * for added/removed rows. Unchanged rows are dropped.
    *
    * `compareCols` defaults to every non-key column present on BOTH
    * sides, so schema drift (a column added in `next`) doesn't fail the
    * diff — pass an explicit list to assert a contract instead.
    */
  def snapshotDiff(
      base: DataFrame,
      next: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: at least one key column")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else base.columns.filterNot(keyCols.contains)
        .filter(next.columns.contains).toSeq
    require(cmp.nonEmpty, "snapshotDiff: no compared columns in common")

    def side(df: DataFrame, tag: String) =
      df.select(keyCols.map(col) ++
        cmp.map(c => col(c).as(s"__${tag}_$c")) :+
        lit(true).as(s"__${tag}_present"): _*)

    val b = side(base, "b")
    val n = side(next, "n")
    val diffs = cmp.map(c => !(col(s"__b_$c") <=> col(s"__n_$c")))
    b.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__b_present").isNull, lit("added"))
          .when(col("__n_present").isNull, lit("removed"))
          .when(diffs.reduce(_ || _), lit("changed")))
      .filter(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed",
          filter(
            array(cmp.map(c =>
              when(!(col(s"__b_$c") <=> col(s"__n_$c")), lit(c))): _*),
            x => x.isNotNull))
          .otherwise(array().cast("array<string>")))
      .select(keyCols.map(col) :+ col("change") :+ col("changed_cols"): _*)
  }
}
