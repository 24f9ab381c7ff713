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

  /** Robust per-group outlier scoring: each row gets
    * `robust_z = (value − median) / (1.4826 · MAD)` computed within its
    * group (MAD = median absolute deviation; 1.4826 scales it to σ under
    * normality) and `is_outlier = |robust_z| > k`. Median/MAD instead of
    * mean/stddev because the rows being hunted are exactly the ones that
    * poison moment-based statistics — a single 1e9 spike shifts a mean
    * past any threshold but leaves the median untouched.
    *
    * Groups where MAD = 0 (over half the group shares one value) score
    * null and flag false — a zero denominator marks a degenerate group,
    * not an infinite outlier.
    *
    * 100 TB shape: two grouped aggregations over the data plus two
    * broadcast joins of O(groups) stat rows — the data never shuffles.
    * The default `exact = false` uses `approx_percentile` (a mergeable
    * sketch with map-side partials, accuracy 1/10000); `exact = true`
    * switches to exact `percentile`, which buffers each group's values in
    * executor memory — the verification-scope setting q58's oracle
    * compare runs, same posture as the brute-force similarity paths.
    */
  /** Equi-depth (quantile) histogram: `buckets` buckets holding ~equal row
    * counts, with per-bucket count and exact value range. Boundaries come
    * from ONE percentile aggregation (approx_percentile sketch by default
    * — mergeable, map-side partials; exact on request for oracle
    * comparison), are rounded to 6 decimals so bucket assignment is
    * engine-reproducible, and ride into the row scan as a
    * [[graft.functions.SearchSorted]] binary-search expression — one
    * O(log buckets) probe per row inside codegen, then one grouped
    * aggregation on the bucket id. The boundary collect is O(buckets) on
    * the driver, the same bounded posture as the IVF codebook.
    *
    * Equi-depth, not equi-width, because skewed columns (the interesting
    * ones) put 99% of rows in one equi-width bin; equal-count bins are
    * what query optimizers and drift monitors actually consume.
    */
  def equiDepthHistogram(
      df: DataFrame,
      valCol: String,
      buckets: Int,
      exact: Boolean = false): DataFrame = {
    val bounds = quantileBounds(df, valCol, buckets, exact)
    df.filter(col(valCol).isNotNull)
      .withColumn("bucket",
        graft.functions.SearchSorted(col(valCol).cast("double"), bounds))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(valCol)).as("min_v"),
        max(col(valCol)).as("max_v"))
  }

  /** Pre-flight inner-equi-join cardinality: the EXACT output row count
    * `Σ_k n_left(k) · n_right(k)` plus the dominant key's contribution and
    * a plan recommendation — the stats pass that catches a join about to
    * emit 10^13 rows BEFORE a cluster burns a day discovering it. Two
    * mergeable grouped counts (nothing wider than the key shuffles), one
    * key-level join of the two count tables, one final row.
    *
    * `advice`: `broadcast_right` when the right side fits
    * `broadcastRowThreshold`, else `salt_skew` when one key contributes
    * more than `skewShare` of the output, else `shuffle` — the three-way
    * decision [[SkewJoin]]/`broadcast()` callers need, derived from
    * counts alone so the oracle can re-derive it.
    */
  def joinCardinality(
      left: DataFrame, right: DataFrame, key: String,
      broadcastRowThreshold: Long = 1000000L,
      skewShare: Double = 0.2): DataFrame = {
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("n_l"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("n_r"))
    lc.join(rc, Seq(key), "full_outer")
      .select(
        coalesce(col("n_l"), lit(0L)).as("n_l"),
        coalesce(col("n_r"), lit(0L)).as("n_r"))
      .agg(
        sum("n_l").as("n_left"),
        sum("n_r").as("n_right"),
        count(when(col("n_l") > 0 && col("n_r") > 0, 1)).as("n_keys_matched"),
        sum(col("n_l") * col("n_r")).as("est_out_rows"),
        max(col("n_l") * col("n_r")).as("top_pair_rows"))
      .select(col("n_left"), col("n_right"), col("n_keys_matched"),
        col("est_out_rows"), col("top_pair_rows"),
        (floor(col("top_pair_rows").cast("double") /
          greatest(col("est_out_rows"), lit(1L)) * 1e6 + 0.5) / 1e6)
          .as("top_share"),
        when(col("n_right") <= broadcastRowThreshold, lit("broadcast_right"))
          .when(col("top_pair_rows").cast("double") >
            greatest(col("est_out_rows"), lit(1L)) * skewShare,
            lit("salt_skew"))
          .otherwise(lit("shuffle")).as("advice"))
  }

  /** Equi-depth bucket boundaries for `valCol`: the `buckets − 1` interior
    * quantiles from ONE percentile aggregation, rounded to 6 decimals so
    * bucket assignment is engine-reproducible. O(buckets) driver state —
    * the same bounded-collect posture as the IVF codebook. Shared by
    * [[equiDepthHistogram]] and [[Drift.psi]], which must bucket two
    * different frames with the SAME boundaries to be comparable.
    */
  private[ops] def quantileBounds(
      df: DataFrame,
      valCol: String,
      buckets: Int,
      exact: Boolean): Seq[Double] = {
    require(buckets >= 2 && buckets <= 10000,
      s"quantileBounds: buckets out of 2..10000: $buckets")
    val pct = if (exact) "percentile" else "approx_percentile"
    val qlist = (1 until buckets).map(i => i.toDouble / buckets)
      .mkString("array(", ", ", ")")
    df.agg(expr(s"$pct($valCol, $qlist)")).head()
      .getSeq[Double](0)
      .map(b => math.floor(b * 1e6 + 0.5) / 1e6)
  }

  def robustOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      valCol: String,
      k: Double = 3.5,
      exact: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "robustOutliers: at least one key column")
    require(k > 0, s"robustOutliers: threshold must be positive, got $k")
    val pct = if (exact) "percentile" else "approx_percentile"
    val keys = keyCols.map(col)
    val med = df.groupBy(keys: _*)
      .agg(expr(s"$pct($valCol, 0.5)").as("_med"))
    val withMed = df.join(broadcast(med), keyCols)
    val mad = withMed.groupBy(keys: _*)
      .agg(expr(s"$pct(abs($valCol - _med), 0.5)").as("_mad"))
    withMed.join(broadcast(mad), keyCols)
      .withColumn("robust_z",
        when(col("_mad") =!= 0.0,
          (col(valCol) - col("_med")) / (lit(1.4826) * col("_mad"))))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > k, lit(false)))
      .withColumnRenamed("_med", "group_median")
      .withColumnRenamed("_mad", "group_mad")
  }
}
