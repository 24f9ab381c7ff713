package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling and skew diagnosis — the stats pass a pipeline runs
  * before committing to a join/partitioning strategy at scale.
  *
  * [[profile]] is ONE aggregation job over the table regardless of column
  * count (every statistic is map-side-combinable, so 100 TB profiles in a
  * single pass with partial aggregation doing almost all the work before
  * the 1-row shuffle). [[keySkew]] is the groupBy-count sketch that tells
  * you whether a key needs salting BEFORE the real job hits the skew, and
  * suggests the salt factor.
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** One-pass, long-format column profile: one row per profiled column
    * with `(column, n_rows, n_nonnull, ndv, min_num, max_num, min_str,
    * max_str)`. Numeric min/max are cast to double (`min_num`/`max_num`);
    * string columns report `min_str`/`max_str`; each is null for the
    * other family. `ndv` is HLL++ (`approx_count_distinct`) by default —
    * `exactNdv = true` switches to exact `count(DISTINCT)`, which costs
    * an Expand (one duplicated pass per column) and is worth it only for
    * modest tables or when the result feeds correctness decisions.
    *
    * All statistics land in ONE `agg` row (then pivot to long format via
    * a literal struct array — no second pass), so the plan is a single
    * partial-agg/final-agg pair no matter how many columns are profiled.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      exactNdv: Boolean = false): DataFrame = {
    val fields = df.schema.fields
      .filter(f => cols.isEmpty || cols.contains(f.name))
    require(fields.nonEmpty, s"no profiled columns among ${df.columns.toSeq}")

    def sfx(name: String, what: String) = s"__p_${what}_$name"
    val aggs: Seq[Column] = count(lit(1)).as("__p_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(sfx(f.name, "nn")),
        (if (exactNdv) count_distinct(c) else approx_count_distinct(c))
          .as(sfx(f.name, "ndv")),
        (if (isNumeric(f.dataType)) min(c).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(sfx(f.name, "minn")),
        (if (isNumeric(f.dataType)) max(c).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(sfx(f.name, "maxn")),
        (if (f.dataType == StringType) min(c)
         else lit(null).cast(StringType)).as(sfx(f.name, "mins")),
        (if (f.dataType == StringType) max(c)
         else lit(null).cast(StringType)).as(sfx(f.name, "maxs")))
    }

    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(fields.map { f =>
        struct(
          lit(f.name).as("column"),
          col("__p_rows").as("n_rows"),
          col(sfx(f.name, "nn")).as("n_nonnull"),
          col(sfx(f.name, "ndv")).as("ndv"),
          col(sfx(f.name, "minn")).as("min_num"),
          col(sfx(f.name, "maxn")).as("max_num"),
          col(sfx(f.name, "mins")).as("min_str"),
          col(sfx(f.name, "maxs")).as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Top-`topK` heaviest values of `key` with their absolute count, share
    * of all rows, and a suggested salt factor for a `tasks`-way stage:
    * `ceil(cnt * tasks / total)` floored at 1 — the number of sub-keys
    * needed so no salted sub-key exceeds an average task's row budget.
    * Pure integer arithmetic so the suggestion is engine-exact.
    *
    * Plan: one partial-combinable groupBy-count, a 1-row total aggregated
    * FROM the grouped table (cheaper than a second scan of the input) and
    * broadcast back, then a top-k sort over the grouped table only.
    */
  def keySkew(df: DataFrame, key: String, topK: Int = 20,
      tasks: Int = 200): DataFrame = {
    require(topK >= 1 && tasks >= 1, s"topK=$topK tasks=$tasks must be >= 1")
    val grouped = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = grouped.agg(sum("cnt").as("total"))
    grouped.crossJoin(broadcast(total))
      .select(
        col(key), col("cnt"),
        (col("cnt").cast(DoubleType) / col("total")).as("share"),
        greatest(lit(1L),
          expr(s"(cnt * $tasks + total - 1) DIV total")).as("salt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(topK)
  }
}
