package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Winnow

/** Substring-level duplicate detection via winnowing fingerprints —
  * the span-granular complement of [[Dedup]]'s whole-document methods.
  * Document-level minhash misses the corpus pattern that actually poisons
  * LLM training sets: thousands of distinct pages all embedding the same
  * boilerplate paragraph, license header, or templated passage. Winnowing
  * ([[graft.functions.WinnowFingerprints]], the MOSS scheme) samples
  * ~2/(w+1) of character-k-gram hashes yet GUARANTEES that any shared
  * substring of `k + w − 1` chars produces a shared fingerprint — so an
  * equi-join on fingerprints is a complete candidate generator for
  * long-span overlap, at a fraction of the all-grams volume.
  *
  * Scale design: candidates come from one equi-join on the fingerprint
  * value (never a cross join); ubiquitous fingerprints — boilerplate
  * shared by more documents than `maxDocsPerFp` — are dropped BEFORE the
  * pair join, because a value shared by m docs would emit m² pair rows
  * (the classic stop-word blowup) while carrying no dedup signal beyond
  * "this is template text". Ids travel, text does not.
  */
object Fingerprint {

  /** Distinct winnowing fingerprints of `text` (k-char grams, window w).
    * `portable = true` = MD5₄₈ gram hashes, reproducible by any engine
    * (the setting for persisted fingerprint indexes and the DuckDB
    * oracle); `portable = false` = XXH64, cheaper, job-internal.
    */
  def fingerprints(
      text: Column, k: Int = 30, w: Int = 8,
      portable: Boolean = true): Column =
    Winnow.fingerprints(text, k, w, portable)

  /** Document pairs sharing at least `minShared` winnowing fingerprints —
    * i.e. likely sharing one or more substrings around `k + w − 1` chars
    * long. Output: `(id_a, id_b, n_shared)` with `id_a < id_b`.
    *
    * One fingerprint explode, one self-equi-join on the 8-byte value,
    * one grouped count. `maxDocsPerFp` caps the join's per-key fan-out;
    * raising `minShared` separates "one boilerplate line in common" from
    * "substantially copied".
    */
  def spanCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 30,
      w: Int = 8,
      minShared: Int = 2,
      maxDocsPerFp: Int = 1000,
      portable: Boolean = true): DataFrame =
    buildSpanCandidates(
      df, idCol, textCol, k, w, minShared, maxDocsPerFp, portable)._1

  /** Scoped form of [[spanCandidates]] that OWNS the persist lifecycle
    * (same contract as [[Dedup.withNearDuplicatesMinhash]]): `f` must
    * consume the frame before returning.
    */
  def withSpanCandidates[T](
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 30,
      w: Int = 8,
      minShared: Int = 2,
      maxDocsPerFp: Int = 1000,
      portable: Boolean = true)(f: DataFrame => T): T = {
    val (pairs, cached) = buildSpanCandidates(
      df, idCol, textCol, k, w, minShared, maxDocsPerFp, portable)
    try f(pairs)
    finally cached.unpersist()
  }

  /** Returns (pair plan, the persisted fingerprint frame whose lifecycle
    * the caller controls).
    */
  private def buildSpanCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      maxDocsPerFp: Int,
      portable: Boolean): (DataFrame, DataFrame) = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDocsPerFp >= 2, s"maxDocsPerFp must be >= 2, got $maxDocsPerFp")
    // Persisted: the exploded (id, fingerprint) frame is referenced by
    // the stop-list aggregation AND both sides of the pair join — without
    // persistence each reference re-scans the corpus and re-hashes every
    // gram (the dominant cost), the same triple-evaluation hazard the
    // minhash path documents. 16 bytes/row spills safely if it must.
    val fp = Dedup.ensureParallelism(
      df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        explode(fingerprints(col(textCol), k, w, portable)).as("f"))
      .persist()
    // stop-fingerprint list: values carried by more docs than the cap.
    // Tiny by construction (only the boilerplate outliers qualify), so it
    // broadcasts and the cap costs one mergeable count plus an anti-join —
    // the full explode is never windowed or re-shuffled.
    val stop = fp.groupBy("f").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxDocsPerFp).select("f")
    val kept = fp.join(broadcast(stop), Seq("f"), "left_anti")
    val pairs = kept.select(col("id").as("id_a"), col("f"))
      .join(kept.select(col("id").as("id_b"), col("f")), Seq("f"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    (pairs, fp)
  }
}
