package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — pair every left interval with every right
  * interval it overlaps (`l.start < r.end && r.start < l.end`,
  * half-open). The genomics/session/outage-correlation workhorse that a
  * naive theta join turns into a cartesian product.
  *
  * Blocked to an EQUI-join: each interval explodes to the coarse bins it
  * touches (`floor(start/bin) .. floor((end−ε)/bin)`), candidates meet in
  * shared bins, the exact predicate verifies. The classic double-count
  * hazard (a pair overlapping across several shared bins matching once
  * per bin) is eliminated WITHOUT a distinct: a pair is emitted only in
  * the bin containing `greatest(l.start, r.start)` — the first bin the
  * two intervals share — so output multiplicity is exactly 1 by
  * construction and no dedup shuffle exists.
  *
  * `binSize` trades explode factor against candidate precision: bins ~
  * the median interval length keep the explode factor ~2 while making
  * same-bin candidates mostly-true. Degenerate (empty/negative)
  * intervals are dropped on both sides.
  */
object IntervalJoin {

  def overlap(
      left: DataFrame,
      right: DataFrame,
      startCol: String,
      endCol: String,
      binSize: Long): DataFrame = {
    require(binSize >= 1, s"binSize must be >= 1: $binSize")

    def binned(df: DataFrame, tag: String) = {
      val s = col(startCol).cast("long")
      val e = col(endCol).cast("long")
      df.filter(s < e)
        .select((df.columns.map(c => col(c).as(s"${tag}_$c")) :+
          explode(sequence(
            floor(s.cast("double") / binSize).cast("long"),
            floor((e - 1).cast("double") / binSize).cast("long")))
            .as("_bin")): _*)
    }

    val l = binned(left, "l")
    val r = binned(right, "r")
    val ls = col(s"l_$startCol")
    val le = col(s"l_$endCol")
    val rs = col(s"r_$startCol")
    val re = col(s"r_$endCol")
    l.join(r, Seq("_bin"))
      .filter(ls < re && rs < le)
      // emit only in the first shared bin: multiplicity exactly 1
      .filter(col("_bin") ===
        floor(greatest(ls, rs).cast("double") / binSize).cast("long"))
      .drop("_bin")
  }
}
