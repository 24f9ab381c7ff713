package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier-timestamp) join — SURVEY.md §2.4: for each left
  * row, attach the latest right row with the same key and
  * `rightTs <= leftTs`.
  *
  * Spark SQL has no built-in as-of join, and the naive composition
  * (range join + per-left-row dedup) explodes: every left row matches its
  * whole right history before the window discards all but one — O(|L|·|R|)
  * intermediate at 100 TB. This implementation is the union-scan form
  * instead: tag both sides, union on (key, ts), and carry the last right
  * payload forward with `last(_, ignoreNulls)` over a single
  * partitionBy(key).orderBy(ts) window — ONE shuffle, O(|L|+|R|) rows, no
  * blowup.
  *
  * Skew bound: all rows of one key serialize into one window task, and AQE
  * skew handling does NOT split window partitions (it applies to joins).
  * With a power-law key distribution the hottest key is the straggler —
  * use [[asofSalted]] there: it buckets the timestamp range so a hot key
  * parallelizes across buckets, with boundary carry-forward in a second,
  * tiny pass. This plain variant stays the default while max key frequency
  * ≪ rows/executor (one shuffle, no carry join).
  *
  * Tie semantics: `rightTs == leftTs` matches (inclusive); among right rows
  * with identical (key, ts) the greatest `struct(rightCols)` wins
  * (lexicographic by column order) — deterministic run-to-run.
  */
object AsofJoin {

  /** @param rightCols   right columns to attach (null when no match).
    * @param inner       drop left rows with no match when true.
    * @param leftOutCols left columns to carry into the output (empty = all).
    *                    The left payload struct rides through the shuffle and
    *                    window — at scale, project it down to what the caller
    *                    actually reads instead of shipping the full row.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      inner: Boolean = false,
      leftOutCols: Seq[String] = Nil): DataFrame = {
    val leftCols =
      if (leftOutCols.isEmpty) left.columns.toIndexedSeq else leftOutCols.toIndexedSeq
    val l = left.select(
      col(leftKey).as("_k"),
      col(leftTs).as("_t"),
      lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(structTypeOf(right, rightCols)).as("_r"))
    val r = right.select(
      col(rightKey).as("_k"),
      col(rightTs).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(structTypeOf(left, leftCols)).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))

    // right rows sort before left rows at equal ts (inclusive match);
    // struct ordering breaks right-side ts ties deterministically.
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val matched = if (inner) carried.filter(col("_match").isNotNull) else carried
    val out =
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c))
    matched.select(out: _*)
  }

  /** Skew-safe variant of [[asof]]: identical semantics (inclusive match,
    * greatest-struct tie-break), but the window partitions on
    * `(key, bucket(ts))` instead of `(key)`, so one hot key parallelizes
    * across its time range instead of serializing into one task.
    *
    * Matches that cross a bucket boundary are carried by a second, tiny
    * window: per `(key, bucket)` the latest right row is summarized (one
    * row per key-bucket), and a running maximum over PRECEDING buckets
    * yields the carry-in for each bucket. Cost: the big data is shuffled
    * once on `(key, bucket)`; the carry pass runs on O(keys × buckets)
    * rows. Correct for any bucketing function that is monotone in ts.
    *
    * @param bucket maps a ts column to its bucket (must be monotone
    *               non-decreasing in ts), e.g.
    *               `t => date_trunc("month", t)` or for numeric epochs
    *               `t => floor(t / 86400)`.
    * @param leftOutCols left columns to carry into the output (empty = all).
    *               The left payload struct crosses the big (key, bucket)
    *               shuffle and the window — projecting it down to what the
    *               caller reads is the dominant constant factor here.
    */
  def asofSalted(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      bucket: Column => Column,
      inner: Boolean = false,
      leftOutCols: Seq[String] = Nil): DataFrame = {
    val leftCols =
      if (leftOutCols.isEmpty) left.columns.toIndexedSeq else leftOutCols.toIndexedSeq
    val l = left.select(
      col(leftKey).as("_k"),
      col(leftTs).as("_t"),
      lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(structTypeOf(right, rightCols)).as("_r"))
    val r = right.select(
      col(rightKey).as("_k"),
      col(rightTs).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(structTypeOf(left, leftCols)).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))

    // NOT persisted, deliberately: the three consumers below each re-derive
    // what they need from the (lazy) union, and the optimizer prunes each
    // derivation — the bucket summary filters `_side = 0`, which collapses
    // the left branch of the union to empty (it scans ONLY the right
    // source, column-pruned to (key, ts, payload)), and the carry seed
    // scans two columns. Materializing the full-width union (an earlier
    // revision persisted it) costs more than those pruned re-scans at any
    // scale, and pins a 100 TB intermediate to executor storage.
    val tagged = l.unionByName(r).withColumn("_b", bucket(col("_t")))

    // carry-in per bucket, ONE aggregation pass over the (column-pruned)
    // union: group every (key, bucket) present on either side — a
    // left-only bucket still needs the carry from earlier right buckets —
    // and summarize the bucket's latest right row as a (ts, payload)
    // ordering struct (max == the row [[asof]]'s window would carry at
    // bucket end; ties on ts resolve to the greatest payload struct, the
    // same tie-break; null when the bucket has no right rows). Then a
    // running max over strictly PRECEDING buckets of the key yields each
    // bucket's carry-in on O(keys × buckets) rows — the skew-free pass.
    // (An earlier revision seeded the buckets with a distinct() and joined
    // a separate right-side-only aggregate — two extra stages and a join
    // for the same rows.)
    val carryW = Window.partitionBy("_k").orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = tagged
      // grouped on (_k, _b), NOT pre-partitioned by _k: partitioning the
      // raw union on the key alone would serialize a hot key's rows into
      // one aggregation task — the exact skew this operator exists to
      // avoid (caught by the hot-key fixture spec). The (_k, _b) partial
      // aggregation stays balanced, and the _k-partitioned carry window
      // exchange only moves the aggregated O(keys x buckets) rows.
      .groupBy("_k", "_b")
      .agg(
        max(when(col("_side") === 0, struct(col("_t"), col("_r"))))
          .as("_last"),
        max(col("_side")).as("_hasLeft"))
      .withColumn("_carry", max(col("_last")).over(carryW))
      // only buckets that contain left rows consume a carry (right-only
      // buckets already contributed their _last to the running max), and a
      // null carry joins to the same result as no row — dropping both
      // shrinks what ships to every executor
      .filter(col("_hasLeft") === 1 && col("_carry").isNotNull)
      .select(col("_k"), col("_b"), col("_carry"))

    // within-bucket as-of (window on (key, bucket) — splittable), then
    // fall back to the carried value when the bucket had no earlier right
    val w = Window.partitionBy("_k", "_b")
      .orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = tagged
      .withColumn("_inb", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .join(carries, Seq("_k", "_b"), "left")
      .withColumn("_match", coalesce(col("_inb"), col("_carry._r")))

    val matched = if (inner) carried.filter(col("_match").isNotNull) else carried
    val out =
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c))
    matched.select(out: _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(cols.map(c => df.schema(c)))
  }
}
