package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a feed of keyed insert/update/delete
  * events into a base table (the MERGE/upsert counterpart of [[Scd2]],
  * which keeps history instead of replacing it).
  *
  * The reference's loads are full overwrites (§3.2's INSERT OVERWRITE
  * parity in `TableLoad`); production tables fed by a CDC stream need the
  * incremental form: apply only what changed, ordered by a sequence
  * column, latest change wins.
  *
  * Semantics of [[Cdc.applyChanges]]:
  *
  *  - for each key, only the change with the highest `seqCol` value
  *    counts (earlier changes in the same batch are superseded);
  *  - latest op `D` → the key is removed from the result;
  *  - latest op `I`/`U` (any non-`D` marker) → the key's row is replaced
  *    by (or inserted as) the change's attributes;
  *  - base keys with no change pass through untouched.
  *
  * Scale shape: the latest-change-per-key reduction is ONE aggregation —
  * `max(struct(seq, op, attrs…))` — not a window sort, so it partially
  * aggregates map-side and shuffles at most one row per key per input
  * partition. The base table then meets the (already reduced) change set
  * in a co-partitioned left-anti join on the same key, and surviving
  * upserts are unioned on — base attributes are never widened through a
  * shuffle, and a small change batch broadcasts into the anti join.
  * Struct ordering compares fields left-to-right; a delete-marker flag
  * sits right after `seqCol`, so equal-`seqCol` ties resolve DELETE-WINS
  * (redundant CDC feeds can replay an update alongside the delete that
  * superseded it with the same sequence number — resurrecting the key on
  * such a tie would be the surprising outcome), and remaining ties fall
  * through to (op, attrs) deterministically rather than picking an
  * arbitrary row; give `seqCol` unique values per key for full control.
  *
  * Precondition: `changes` carries every `base` column plus `seqCol` and
  * `opCol`.
  */
object Cdc {

  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "cdc: at least one key column")
    val attrs = base.columns.toSeq.filterNot(keys.contains)
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max(struct(
        col(seqCol) +:
          when(col(opCol) === deleteOp, 1).otherwise(0).as("_del") +:
          col(opCol) +: attrs.map(col): _*)).as("_c"))
      .select(keys.map(col) ++
        Seq(col(s"_c.$opCol").as(opCol)) ++
        attrs.map(a => col(s"_c.$a").as(a)): _*)
    val upserts = latest.filter(col(opCol) =!= deleteOp)
      .select((keys ++ attrs).map(col): _*)
    base
      .join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(upserts)
  }
}
