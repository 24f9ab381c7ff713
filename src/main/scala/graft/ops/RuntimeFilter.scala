package graft.ops

import java.io.{BufferedInputStream, BufferedOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomMightContain

/** Explicit runtime join filters: aggregate a join's build side into a
  * compact bloom filter, broadcast it, and prune the probe side BEFORE its
  * shuffle — the classic sideways-information-passing move for a 100 TB
  * fact table, where most shuffle bytes belong to rows no build key will
  * ever match.
  *
  * Catalyst already injects bloom runtime filters WITHIN one query
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only where the
  * optimizer can see both sides of the join in the same plan. This
  * operator covers what that can't reach:
  *
  *  - **cross-stage filters**: the key set is produced by one pipeline run
  *    (e.g. yesterday's dedup index, an eval-set id list) and applied while
  *    INGESTING another — [[save]]/[[load]] persist the filter as a small
  *    artifact so the probe job never touches the build data;
  *  - **above-optimizer composition**: operators like the dedup index join
  *    build their probe set outside a single SQL plan.
  *
  * Correctness contract: a bloom filter has false positives only, never
  * false negatives — [[preFilter]] keeps every row whose key IS in the
  * build set, so any exact join/anti-join downstream of it produces
  * byte-identical results to the unfiltered plan (q42's oracle proves
  * exactly this). [[preFilter]] alone is therefore an OVER-approximation
  * of a semi join, suitable as a reducer, not a replacement.
  *
  * Sizing: bits ≈ 1.44 · n · log2(1/fpp); 10 M keys at 1% fpp is ~17 MB —
  * broadcastable. The build is Spark's own distributed
  * `DataFrameStatFunctions.bloomFilter` (per-partition filters, tree
  * merge), so no key list ever lands on the driver.
  */
object RuntimeFilter {

  /** Distributed bloom build over `build`'s `key` column (bigint or
    * string — `stat.bloomFilter` inserts longs / UTF-8 bytes, matching
    * the probe expression). `expectedItems < 0` counts the build side
    * first: one cheap extra job on what is by definition the small side,
    * in exchange for a filter sized to the real key count instead of a
    * guess (an oversized guess wastes broadcast bytes, an undersized one
    * inflates fpp).
    */
  def buildBloom(
      build: DataFrame,
      key: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems else build.count().max(1L)
    build.stat.bloomFilter(key, n, fpp)
  }

  /** Broadcast `bloom` and keep only probe rows whose `key` might be in
    * it. A narrow, codegen'd filter — no shuffle, no new stage; the
    * executor pulls the bitset once regardless of task count.
    */
  def preFilter(probe: DataFrame, key: String, bloom: BloomFilter): DataFrame = {
    val bc: Broadcast[BloomFilter] =
      probe.sparkSession.sparkContext.broadcast(bloom)
    probe.filter(BloomMightContain(probe(key), bc))
  }

  /** Build-and-apply in one call: prune `probe` down to rows whose
    * `probeKey` might appear among `build`'s `buildKey`s. The caller's
    * real join afterwards removes the fpp-bounded false positives.
    */
  def preJoinFilter(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      fpp: Double = 0.01): DataFrame =
    preFilter(probe, probeKey, buildBloom(build, buildKey, fpp = fpp))

  /** Persist a filter as a single small artifact (cross-stage / cross-day
    * reuse — the probe job loads ~MBs instead of re-aggregating the build
    * data).
    */
  def save(bloom: BloomFilter, path: String, df: DataFrame): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new BufferedOutputStream(fs.create(p, true))
    try bloom.writeTo(out) finally out.close()
  }

  /** Load a filter persisted by [[save]]. */
  def load(path: String, df: DataFrame): BloomFilter = {
    val p = new Path(path)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val in = new BufferedInputStream(fs.open(p))
    try BloomFilter.readFrom(in) finally in.close()
  }
}
