package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** DoReMi — Domain Reweighting with Minimax Optimization (Xie et al.,
  * NeurIPS 2023): compute a domain-mixture weight vector for a grouped
  * corpus, upweighting the domains with the most "learnable headroom"
  * (excess loss), then resample the corpus toward that mixture.
  *
  * The published recipe trains a small proxy NETWORK under Group DRO:
  * the inner player minimizes the α-weighted loss, the outer player
  * raises α on domains whose per-example loss exceeds a pretrained
  * reference model's. Re-expressed over this repo's count-based trigram
  * LM ([[LanguageModel]]), both players become closed forms:
  *
  *   - inner (proxy "training"): the weighted-MLE mixture LM — per-gram
  *     expected counts `w(g) = Σ_d α_d · (T / tot_d) · c(g, d)`, i.e.
  *     each domain contributes an `α_d` share of the T-gram training
  *     budget distributed per its own gram distribution (Σ_g w = T);
  *   - reference: the per-domain SPECIALIST model — the add-k trigram LM
  *     trained on that domain alone. This keeps the paper's semantics
  *     (excess = how far the shared model sits above what is achievable
  *     on the domain) while staying a closed form; with a count model
  *     the paper's uniform-trained reference would equal the α₀ proxy
  *     exactly and the dynamics would never move;
  *   - outer: the exponentiated-gradient step on per-domain clipped
  *     excess loss `ex_d = mean_docs max(0, ℓ_α(x) − ℓ_ref(x))`,
  *     `α'_d ∝ α_d · exp(η · ex_d)`, mixed with uniform (the paper's
  *     smoothing term keeps every domain alive). The returned weight is
  *     the average of the α iterates, the paper's final output.
  *
  * Determinism contract (the repo's cross-engine grid discipline):
  * per-doc avg-NLLs snap to the 1e-4 grid, per-domain excess to 1e-6,
  * α iterates to 1e-9 after each normalize, shares/rates to 1e-6 — so
  * the oracle replays every step bit-for-bit. The residual risk class is
  * the one t15/t19 already accept: ulp-order noise in float sums (and
  * libm exp/ln parity) sitting exactly on a grid boundary.
  *
  * Scale shape (100 TB posture): the corpus text is tokenized ONCE into
  * a persisted per-(doc, gram) count frame (the [[Dsir]] rawCounts
  * pattern); every later pass — the specialist reference scoring and one
  * scoring pass per EG step — is a broadcast-model join over that frame
  * (models are vocabulary-bounded, alphabet^n at worst, like
  * [[LanguageModel.score]]), never a re-scan of the text. Driver state
  * is O(domains) per step (α, totals, excess) — the bounded-model-state
  * exception [[Clustering.kmeans]] established. The EG loop is the
  * [[QualityClassifier]] epoch cadence: T broadcast joins over one
  * persisted frame.
  *
  * Reference basis: the reference repo has no data-selection surface
  * (its processors stop at column hygiene,
  * etl_projects/base/processors/spark/spark_dataframe_service.py) —
  * this extends the LLM-training-pipeline surface next to [[Dsir]]
  * (instance-level selection) with the published DOMAIN-level mixture
  * optimizer.
  */
object Doremi {

  /** Per-domain mixture weights + deterministic resample verdicts.
    *
    * Output, one row per domain, ordered by nothing (caller sorts):
    * `(domainCol, n_docs, share, excess, weight, rate, n_kept)` —
    * `share` the domain's document share of the corpus (1e-6 grid),
    * `excess` the final EG step's clipped excess loss (1e-6), `weight`
    * the averaged α iterate (1e-9), `rate = min(1, weight / share)`
    * (1e-6; downsample-only, the [[Curation.temperatureSample]]
    * posture), and `n_kept` the count of documents surviving the
    * md5-coin resample at that rate.
    *
    * Documents with fewer than `n` characters produce no grams, score
    * under no model, and are excluded from the excess means (they still
    * count toward `share` and play the resample coin — membership is a
    * pure function of the id). A domain whose every document is
    * unscoreable keeps excess 0 and rides the smoothing floor.
    */
  def domainWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      n: Int = 3,
      addK: Double = 0.5,
      alphabetSize: Int = 64,
      steps: Int = 3,
      eta: Double = 1.0,
      smoothing: Double = 1e-3,
      salt: String = "doremi"): DataFrame =
    plan(docs, idCol, textCol, domainCol, n, addK, alphabetSize,
      steps, eta, smoothing, salt)._1

  /** [[domainWeights]] in a scope. Since the EG loop drives every
    * consumer of the internal caches eagerly, [[plan]] releases them
    * itself before returning — so the bare form already leaves nothing
    * pinned and this wrapper adds no lifecycle work; it is kept for
    * call-site symmetry with [[Dsir.withSelect]] and as the place a
    * future lazy-output variant would re-own the persists.
    */
  def withDomainWeights[T](
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      n: Int = 3,
      addK: Double = 0.5,
      alphabetSize: Int = 64,
      steps: Int = 3,
      eta: Double = 1.0,
      smoothing: Double = 1e-3,
      salt: String = "doremi")(f: DataFrame => T): T = {
    val (weights, persisted) = plan(docs, idCol, textCol, domainCol,
      n, addK, alphabetSize, steps, eta, smoothing, salt)
    try f(weights)
    finally persisted.foreach(_.unpersist(blocking = false))
  }

  /** Resample the corpus toward the computed mixture: keep each document
    * with probability `rate` of its domain, decided by the repo's pure
    * md5-coin (`conv(md5(id ∥ salt)[1..5]) < ⌊rate · 2^20⌋`) — the exact
    * surviving row set is re-derivable on any engine. `weights` is
    * [[domainWeights]]' output (only `domainCol` and `rate` are read);
    * downsample-only, like the published pipeline's resampling stage.
    */
  def resample(
      docs: DataFrame,
      idCol: String,
      domainCol: String,
      weights: DataFrame,
      salt: String = "doremi"): DataFrame =
    docs
      .join(broadcast(weights.select(col(domainCol), col("rate"))),
        Seq(domainCol), "left")
      // a domain absent from the fit (the crawl evolved after the
      // offline snapshot) passes through at rate 1 rather than silently
      // vanishing — the fail-open choice a GATE must make; re-fit per
      // snapshot to bring new domains under the mixture
      .filter(coin(idCol, salt) <
        floor(coalesce(col("rate"), lit(1.0)) * 1048576L).cast("long"))
      .drop("rate")

  // ----------------------------------------------------------- internals

  private def coin(idCol: String, salt: String) =
    conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 5),
      16, 10).cast("long")

  private def g4(c: org.apache.spark.sql.Column) = floor(c * 1e4 + 0.5) / 1e4
  private def g6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6

  private def grid(v: Double, g: Double): Double =
    math.floor(v * g + 0.5) / g

  private def plan(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      n: Int,
      addK: Double,
      alphabetSize: Int,
      steps: Int,
      eta: Double,
      smoothing: Double,
      salt: String): (DataFrame, Seq[DataFrame]) = {
    require(n >= 2, s"order-$n model has no context; need n >= 2")
    require(steps >= 1, s"steps must be >= 1: $steps")
    require(addK > 0 && alphabetSize > 1, "bad smoothing parameters")
    require(smoothing >= 0 && smoothing < 1, s"smoothing in [0,1): $smoothing")
    val spark = docs.sparkSession

    // one text scan: per-(doc, domain, gram) counts, multiplicity
    // collapsed map-side before the shuffle (the Dsir rawCounts pattern)
    val pg = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"), col(domainCol).as("_dom"),
        explode(Shingles.charNGramsAll(col(textCol), n)).as("gram"))
      .groupBy("_id", "_dom", "gram")
      .agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // vocabulary-bounded model tables, derived from pg (never the text)
    val dgc = pg.groupBy("_dom", "gram").agg(sum("c").as("dc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dctx = dgc.groupBy(col("_dom"),
        substring(col("gram"), 1, n - 1).as("pre"))
      .agg(sum("dc").as("dcc"))

    // O(domains) driver state: gram totals and document counts
    val tots: Map[String, Long] = dgc.groupBy("_dom")
      .agg(sum("dc").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs: Map[String, Long] = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(!nDocs.contains(null),
      "domainWeights: null domain values — fill or filter them first")
    val domains = nDocs.keys.toSeq.sorted
    val totalGrams = tots.values.sum.toDouble
    val totalDocs = nDocs.values.sum.toDouble
    val nd = domains.size

    // reference: each domain's own specialist model, scored once.
    // dgc/dctx are vocabulary-bounded — broadcast them so corpus-sized pg
    // never shuffles on (domain, gram).
    val refNllExpr = -log(
      (col("dc").cast("double") + addK) /
        (col("dcc").cast("double") + addK * alphabetSize))
    val dctxR = dctx.select(col("_dom").as("_domc"), col("pre"), col("dcc"))
    val refNll = pg
      .join(broadcast(dgc), Seq("_dom", "gram"))
      .join(broadcast(dctxR),
        col("_dom") === col("_domc") &&
          substring(col("gram"), 1, n - 1) === col("pre"))
      .groupBy(col("_id"), col("_dom"))
      .agg((sum(col("c") * refNllExpr) / sum(col("c")).cast("double"))
        .as("_l"))
      .select(col("_id"), col("_dom"), g4(col("_l")).as("lref"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // exponentiated-gradient loop; α and excess live on the driver,
    // O(domains) per step
    var alpha: Map[String, Double] = domains.map(_ -> 1.0 / nd).toMap
    val iterates = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    var lastExcess: Map[String, Double] = domains.map(_ -> 0.0).toMap

    for (_ <- 0 until steps) {
      // proxy = weighted-MLE mixture of the per-domain distributions:
      // scale_d = α_d · (T / tot_d); w(g) = Σ_d c(g,d) · scale_d.
      // The product order (c · (α · (T / tot))) is pinned — the oracle
      // computes the identical sequence.
      val scaleRows = domains.map { d =>
        val tot = tots.getOrElse(d, 0L)
        Row(d, if (tot == 0L) 0.0 else alpha(d) * (totalGrams / tot))
      }
      val scaleDF = spark.createDataFrame(
        spark.sparkContext.parallelize(scaleRows, 1),
        StructType(Seq(StructField("_dom", StringType),
          StructField("scale", DoubleType))))
      val model = dgc.join(broadcast(scaleDF), Seq("_dom"))
        .groupBy("gram")
        .agg(sum(col("dc").cast("double") * col("scale")).as("w"))
      val ctx = model.groupBy(substring(col("gram"), 1, n - 1).as("pre"))
        .agg(sum("w").as("wc"))
      val mixNll = -log(
        (col("w") + addK) / (col("wc") + addK * alphabetSize))
      val scored = pg
        .join(broadcast(model), Seq("gram"))
        .join(broadcast(ctx), substring(col("gram"), 1, n - 1) === col("pre"))
        .groupBy(col("_id"), col("_dom"))
        .agg((sum(col("c") * mixNll) / sum(col("c")).cast("double"))
          .as("_l"))
        .select(col("_id"), g4(col("_l")).as("l"))
      val excessRows = scored
        .join(refNll.select(col("_id"), col("_dom"), col("lref")), Seq("_id"))
        .groupBy("_dom")
        .agg(g6(avg(greatest(col("l") - col("lref"), lit(0.0)))).as("ex"))
        .collect()
      val excess = domains.map(_ -> 0.0).toMap ++
        excessRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
      lastExcess = excess
      // EG update, uniform-smoothed, α snapped to the 1e-9 grid; the sum
      // runs in sorted-domain order so the normalizer is deterministic
      val unnorm = domains.map(d => d -> alpha(d) * math.exp(eta * excess(d)))
      val z = unnorm.map(_._2).sum
      alpha = unnorm.map { case (d, u) =>
        d -> grid((1.0 - smoothing) * (u / z) + smoothing / nd, 1e9)
      }.toMap
      iterates += alpha
    }

    // final weight = mean of the α iterates (the paper's output), and the
    // downsample-only resample verdicts
    val outRows = domains.map { d =>
      val weight = grid(iterates.map(_(d)).sum / steps, 1e9)
      val share = grid(nDocs(d) / totalDocs, 1e6)
      val rate = grid(math.min(1.0, weight / share), 1e6)
      Row(d, nDocs(d), share, lastExcess(d), weight, rate)
    }
    val outDF = spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1),
      StructType(Seq(
        StructField(domainCol, StringType),
        StructField("n_docs", LongType),
        StructField("share", DoubleType),
        StructField("excess", DoubleType),
        StructField("weight", DoubleType),
        StructField("rate", DoubleType))))

    // one ids-only corpus pass counts the md5-coin survivors per domain
    val kept = docs
      .join(broadcast(outDF.select(col(domainCol), col("rate"))),
        Seq(domainCol))
      .filter(coin(idCol, salt) <
        floor(col("rate") * 1048576L).cast("long"))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("_nk"))
    val weights = outDF
      .join(kept, Seq(domainCol), "left")
      .select(col(domainCol), col("n_docs"), col("share"), col("excess"),
        col("weight"), col("rate"),
        coalesce(col("_nk"), lit(0L)).as("n_kept"))

    // every consumer of the persisted frames ran eagerly inside the EG
    // loop (the collects above); the returned frame reads only `docs`
    // and the driver-built rows — release the caches before returning
    // so even the bare entry point leaves nothing pinned
    Seq(pg, dgc, refNll).foreach(_.unpersist(blocking = false))
    (weights, Nil)
  }
}
