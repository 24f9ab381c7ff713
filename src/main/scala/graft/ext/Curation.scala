package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after cleaning
  * and dedup (SURVEY.md §7.5 adjacents): deterministic stratified sampling
  * and token-budget sequence packing. Both are pure Catalyst compositions
  * designed around one rule — nothing in them serializes onto a single
  * task at 100 TB.
  */
object Curation {

  // ------------------------------------------------- stratified sampling

  /** 8-hex-char keep-threshold for fraction `f`: a 32-bit hash value x is
    * kept iff x < ceil(f·2^32), and since equal-length lowercase hex
    * preserves integer order, that is exactly `hex8(x) < hex8(threshold)`
    * — a pure STRING comparison both Spark and any oracle engine evaluate
    * identically (no hex-to-int parsing differences). f ≥ 1 returns "g",
    * which sorts after every hex digit (keep all).
    */
  private[ext] def keepThresholdHex(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction out of [0,1]: $f")
    val t = math.ceil(f * 4294967296.0).toLong
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** Deterministic stratified sample: keeps a row iff the first 8 hex
    * chars of `md5(id || salt)` sort below the stratum's
    * [[keepThresholdHex]]. A pure projection + filter — no shuffle, no RNG
    * state, same sample on every engine, run, and cluster layout (unlike
    * `rand(seed)`, whose stream is row-order-dependent, or `sampleBy`,
    * which is seed-and-partitioning-sensitive); rows in strata absent from
    * `fractions` are dropped (fraction 0). The reproducibility is the
    * point: a training-corpus sample must be re-derivable bit-for-bit
    * months later.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "stratifiedSample: empty fractions map")
    // small literal CASE chain (strata are few); deterministic order
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit("00000000")) { case (acc, (k, f)) =>
        when(col(stratumCol) === k, keepThresholdHex(f)).otherwise(acc)
      }
    df.filter(
      substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 8)
        < threshold)
  }

  // --------------------------------------------- token-budget bin packing

  /** Greedy sequence packing for pre-training batches: documents in
    * `idCol` order are packed into consecutive bins of ~`budgetTokens`
    * whitespace tokens — bin id = floor(exclusive-prefix-tokens / budget),
    * so a bin closes once its running total reaches the budget (the last
    * document may straddle the boundary, the standard greedy trade).
    *
    * The global running sum is computed as a DISTRIBUTED two-phase scan,
    * not one unpartitioned window (which would serialize the corpus into a
    * single task): range-partition by id, per-partition running sums in
    * parallel, then one tiny pass over the O(partitions) per-partition
    * totals yields each partition's global offset (same carry shape as
    * [[graft.ops.AsofJoin.asofSalted]]). Bin ids depend only on the global
    * id order — NOT on where partition boundaries land — so the output is
    * deterministic for any partition count. `idCol` must be unique (a
    * duplicate id would make the running order, and thus bins, ambiguous).
    *
    * Output: `(id, n_tokens, bin)`.
    */
  def packTokenBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "packTokenBudget: budget must be positive")
    val base = df.select(
      col(idCol).as("id"),
      TextAnalysis.tokenCountWhitespace(col(textCol)).cast("long")
        .as("n_tokens"))
      .repartitionByRange(col("id"))
      .withColumn("_p", spark_partition_id())

    val localW = Window.partitionBy("_p").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("_cum", sum("n_tokens").over(localW))

    // O(partitions) rows: each partition's token total, then the running
    // offset over strictly preceding partitions
    val offW = Window.orderBy("_p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("_p").agg(max("_cum").as("_total"))
      .withColumn("_off", coalesce(sum("_total").over(offW), lit(0L)))
      .select("_p", "_off")

    // integer DIV, not floor(double /): the exclusive prefix is a
    // non-negative long, so `div` is exact at any corpus size — a double
    // quotient would lose ulps once prefixes pass 2^53 tokens
    local.join(broadcast(offsets), Seq("_p"))
      .select(
        col("id"),
        col("n_tokens"),
        expr(s"(_off + _cum - n_tokens) DIV $budgetTokens")
          .cast("long").as("bin"))
  }
}
