package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.simhash64
import graft.functions.MinHashFunctions.minhash_signature
import Shingles._

/** Deduplication operators for LLM-corpus pipelines (SURVEY.md §7.5).
  *
  * Scale design: every method is blocking-based — candidates are generated
  * by an equi-join on a derived key (hash bucket, LSH band, SimHash chunk),
  * never by a cross join — so each stage is a plain shuffle whose cost is
  * O(candidates), not O(n²). That is the property that lets the same plan
  * run at 100 TB.
  */
object Dedup {

  /** Decouple CPU parallelism from input split count: a small or
    * single-row-group parquet table arrives as one partition, which would
    * serialize the signature/shingle computation onto one core no matter
    * how many executors exist. Round-robin up to the cluster's default
    * parallelism — a no-op when the scan already yields enough splits (the
    * 100 TB case), a cheap shuffle of (id, text) rows when it doesn't.
    */
  private def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  // ---------------------------------------------------------------- exact

  /** Content fingerprint: md5 of normalized text. md5 (not xxhash) so the
    * fingerprint is reproducible across engines (DuckDB oracle parity) and
    * stable across Spark versions.
    */
  def exactFingerprint(text: Column): Column = md5(normalizeText(text))

  /** Exact dedup keeping the smallest id per fingerprint — deterministic,
    * unlike `dropDuplicates` which keeps an arbitrary row. One hash
    * aggregation (partial + final), no sort.
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(exactFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------- minhash

  /** MinHash + LSH banding candidate pairs, verified with exact Jaccard on
    * the shingle set; emits `(id_a, id_b, jaccard)` with `id_a < id_b` for
    * pairs at or above `threshold`.
    *
    * Pipeline: shingle → k-minhash signature → split into `bands` bands →
    * hash each band → self-join on (band_index, band_hash) → distinct pairs
    * → verify. With k=64, bands=16 (r=4), the S-curve catches ~all pairs
    * with J ≥ 0.8 while keeping candidates near-linear.
    */
  def nearDuplicatesMinhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    val shingled = ensureParallelism(df.select(
      col(idCol).as("id"),
      tokenSet(col(textCol)).as("shingles")))

    val banded = shingled
      .withColumn("sig", minhash_signature(col("shingles"), numHashes))
      .select(
        col("id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            j => hash(slice(col("sig"), j * rows + 1, lit(rows))))))
      .toDF("id", "band", "band_hash")

    val candidates = banded.as("x")
      .join(banded.as("y"), Seq("band", "band_hash"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    candidates
      .join(shingled.withColumnRenamed("shingles", "sh_a"), col("id_a") === col("id"))
      .drop("id")
      .join(
        shingled.withColumnRenamed("shingles", "sh_b").withColumnRenamed("id", "id2"),
        col("id_b") === col("id2"))
      .select(
        col("id_a"),
        col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** SimHash near-dup pairs: 64-bit signature over the token set, banded
    * into four 16-bit chunks (pigeonhole: Hamming distance ≤ 3 ⇒ at least
    * one chunk identical), verified with `bit_count(xor) ≤ maxHamming`.
    * Emits `(id_a, id_b, hamming)`.
    */
  def nearDuplicatesSimhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = ensureParallelism(df.select(
      col(idCol).as("id"),
      col(textCol).as("_text")))
      .select(col("id"), simhash64(tokenSet(col("_text"))).as("sig"))

    val chunked = sigs.select(
      col("id"), col("sig"),
      posexplode(array(
        (0 until 4).map(j =>
          shiftright(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "sig", "chunk", "chunk_val")

    chunked.as("x")
      .join(chunked.as("y"), Seq("chunk", "chunk_val"))
      .filter(col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"),
        col("y.id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Blocked n-gram Jaccard dedup: pairs within the same blocking group
    * (e.g. `lang`, exact char length — near-dups by reordering share both)
    * compared by character-n-gram Jaccard. The blocking join keeps the
    * candidate count near-linear; never a cross join.
    */
  def nearDuplicatesNgram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockingCols: Seq[String],
      threshold: Double,
      n: Int = 3): DataFrame = {
    val grams = ensureParallelism(df.select(
      col(idCol).as("id") +: col(textCol).as("_text") +:
        blockingCols.map(col): _*))
      .select(col("id") +: charNGrams(col("_text"), n).as("grams") +:
        blockingCols.map(col): _*)

    grams.as("x")
      .join(grams.as("y"), blockingCols)
      .filter(col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"),
        col("y.id").as("id_b"),
        jaccard(col("x.grams"), col("y.grams")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------- embedding cosine

  /** Embedding near-dup pairs with cosine ≥ `minCosine`, blocked by
    * random-hyperplane LSH buckets (see [[Similarity.hyperplaneBucket]]) so
    * the pair generation is an equi-join. High-cosine pairs agree on most
    * hyperplane signs, so recall at 0.95+ cosine is near-perfect with
    * 1-bit-flip probing.
    */
  def nearDuplicatesEmbedding(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      planes: Int = 8,
      seed: Long = 42L): DataFrame =
    Similarity.cosinePairsLsh(df, idCol, vecCol, planes, seed)
      .filter(col("cosine") >= minCosine)

  /** Exact variant for verification/small scopes: all pairs via a single
    * self-join on a trivial key is O(n²) — only for bounded inputs (the
    * sf-scale oracle); the LSH path above is the 100 TB path. `maxRows`
    * enforces that scope (fail fast instead of an accidental 10^16-pair
    * cross join on a production table).
    */
  def nearDuplicatesEmbeddingExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      maxRows: Long = Similarity.DefaultBruteForceMaxRows): DataFrame =
    Similarity.cosinePairsBruteForce(df, idCol, vecCol, maxRows)
      .filter(col("cosine") >= minCosine)
}
