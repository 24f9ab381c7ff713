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
  * With a power-law key distribution the hottest key is the straggler; the
  * scale mitigation is to bucket the timestamp range per hot key and carry
  * the last value across bucket boundaries in a second tiny pass (not
  * implemented here — documented trade-off, acceptable while max key
  * frequency ≪ rows/executor).
  *
  * Tie semantics: `rightTs == leftTs` matches (inclusive); among right rows
  * with identical (key, ts) the greatest `struct(rightCols)` wins
  * (lexicographic by column order) — deterministic run-to-run.
  */
object AsofJoin {

  /** @param rightCols right columns to attach (null when no match).
    * @param inner     drop left rows with no match when true.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      inner: Boolean = false): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
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

  private def structTypeOf(df: DataFrame, cols: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(cols.map(c => df.schema(c)))
  }
}
