package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SearchSorted

/** Z-order (Morton-curve) data layout for multi-column file skipping.
  *
  * A table sorted on ONE column gives parquet min/max pruning on that
  * column and nothing else; sorting on the bit-interleaved z-value of
  * SEVERAL columns gives every participating column locally-bounded
  * ranges in every file, so a selective predicate on ANY of them prunes
  * most files. At 100 TB this is the difference between scanning a full
  * table and touching a few percent of its files for the dominant filter
  * columns — the same layout optimization Delta's `OPTIMIZE ZORDER BY`
  * and many warehouse `CLUSTER BY` implementations apply (the curve math
  * is textbook Morton interleaving; see Morton 1966).
  *
  * The pipeline is three declarative steps, all shuffle-accounted:
  *  1. each column is rank-bucketed to `bits` bits via `approxQuantile`
  *     boundaries (one lightweight stats pass; boundaries are a few
  *     hundred doubles broadcast inside the expression) — quantile
  *     bucketing, not min/max scaling, so skewed columns still spread
  *     over the full bucket range;
  *  2. buckets are bit-interleaved into the z-value ([[interleave]] —
  *     pure built-in shift/mask column ops, whole-stage-codegen'd);
  *  3. one `repartitionByRange` + in-partition sort on the z-value (a
  *     single range shuffle — exactly what a plain global sort costs)
  *     lays files out along the curve.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative integer
    * columns: result bit `i * cols.length + j` is bit `i` of column `j`
    * (column 0 owns the least-significant position of each group).
    *
    * Two dimensions use the O(log bits) magic-mask spread; other widths
    * use the generic per-bit form. Both are pure built-in long arithmetic
    * (`shiftleft`/`shiftright`/bitwise and-or), so the whole z-value stays
    * inside whole-stage codegen and is expressible verbatim in any SQL
    * dialect for cross-engine verification.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleave needs at least one column")
    require(bits >= 1 && bits * cols.length <= 63,
      s"bits*dims must fit a long: bits=$bits dims=${cols.length}")
    val d = cols.length
    if (d == 1) cols.head.cast("long").bitwiseAND(lit((1L << bits) - 1))
    else if (d == 2) {
      cols.zipWithIndex
        .map { case (c, j) => shiftleft(spread2(c, bits), j) }
        .reduce(_ bitwiseOR _)
    } else {
      val terms = for {
        (c, j) <- cols.zipWithIndex
        x = c.cast("long")
        i <- 0 until bits
      } yield shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * d + j)
      terms.reduce(_ bitwiseOR _)
    }
  }

  /** Magic-mask bit spread for the 2-D curve: the low 16 (or fewer) bits
    * of `c` end up at even positions. Standard Morton spreading —
    * `(x | x<<8) & 0x00FF00FF` … `(x | x<<1) & 0x55555555`.
    */
  private def spread2(c: Column, bits: Int): Column = {
    require(bits <= 16, s"2-D magic spread handles <=16 bits, got $bits")
    var x = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
    for ((sh, mask) <- Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
                           2 -> 0x33333333L, 1 -> 0x55555555L))
      x = (x bitwiseOR shiftleft(x, sh)).bitwiseAND(lit(mask))
    x
  }

  /** Rank-bucket a column into `2^bits` quantile buckets. The boundary
    * probe is one `approxQuantile` stats pass (relative error defaulting
    * to half a bucket); nulls map to bucket 0 so they cluster together at
    * the curve origin instead of scattering.
    */
  def quantileBucket(df: DataFrame, colName: String, bits: Int): Column = {
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val bounds = df.stat.approxQuantile(
      Seq(colName).toArray, probs, 0.5 / (nb + 1)).head.toSeq
    if (bounds.isEmpty || bounds.forall(_ == bounds.head))
      lit(0) // constant or empty column: a single bucket
    else
      coalesce(SearchSorted(col(colName).cast("double"), bounds), lit(0))
  }

  /** The z-value of `zCols` at `bits` bits per column, quantile-bucketed
    * from `df`'s own distribution.
    */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column =
    interleave(zCols.map(quantileBucket(df, _, bits)), bits)

  /** Re-layout `df` along the z-curve of `zCols` into `numFiles` output
    * partitions: one range shuffle on the z-value, in-partition sort, and
    * the helper column dropped before the caller writes. `bits` defaults
    * to 8 — 256 buckets per column is tight enough that per-file ranges
    * track file count, while keeping the quantile probe trivial.
    */
  def cluster(df: DataFrame, zCols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    require(zCols.nonEmpty, "cluster needs at least one z-order column")
    val zc = "__graft_z"
    df.withColumn(zc, zValue(df, zCols, bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Z-order + write in one call: [[cluster]] then [[TableWriter.write]]
    * with `maxRecordsPerFile` disabled in favor of the explicit file
    * count (the range partitioning already balances rows per file).
    */
  def write(df: DataFrame, zCols: Seq[String], numFiles: Int,
      spec: TableWriter.Spec, bits: Int = 8): Unit =
    TableWriter.write(cluster(df, zCols, numFiles, bits), spec)
}
