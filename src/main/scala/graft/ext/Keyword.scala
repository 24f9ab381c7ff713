package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval (Robertson/Spärck Jones) — the lexical half of
  * hybrid search next to [[Similarity]]'s embedding ANN.
  *
  * The index is two relational artifacts, both one-aggregation builds
  * over the corpus and both O(postings), not O(corpus²):
  * `(doc, term, tf, doclen)` postings and `(term, df)` document
  * frequencies. Scoring is an equi-join of query terms against the
  * postings (ids and terms travel — document text is never re-read at
  * query time), a per-(query, doc) sum, and a bounded per-query top-k.
  * Everything is deterministic double arithmetic, so DuckDB re-derives
  * the exact scores for the oracle.
  *
  * Tokenization is byte-identical to the rest of the text stack (`trim`
  * + `\s+`, the t-family contract); no stemming/lowercasing — those are
  * corpus-policy transforms a caller applies beforehand if wanted.
  */
object Keyword {

  /** Postings: one row per (doc, term) with term frequency and the
    * document's token length (carried on every posting so scoring never
    * rejoins the corpus).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(
        col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("_w"))
      .filter(size(col("_w")) > 0)
      .select(col("doc_id"), size(col("_w")).as("doclen"),
        explode(col("_w")).as("term"))
      .filter(length(col("term")) > 0)
    toks.groupBy("doc_id", "doclen", "term")
      .agg(count(lit(1)).as("tf"))
  }

  /** Document frequency per term — one aggregation over the postings. */
  def docFreq(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** BM25 top-`k` documents per query. `queries` is `(query_id,
    * queryText)`; query terms are de-duplicated (standard bag-of-words
    * query semantics). Corpus stats (N, avgdl) come from one tiny agg
    * broadcast into the score expression.
    */
  def searchBM25(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    searchBM25Indexed(postings(docs, idCol, textCol),
      queries, queryIdCol, queryTextCol, k, k1, b)

  /** Search against a PREBUILT postings frame — the production shape: at
    * corpus scale the index is built once ([[postings]]) and persisted
    * as a table, and every query batch reads the artifact instead of
    * re-tokenizing the corpus. (The convenience one-shot overload above
    * derives docfreq and corpus stats from the same in-plan postings
    * subtree, which Catalyst scans twice — fine for a single ad-hoc
    * run, wasteful as a serving path.)
    */
  def searchBM25Indexed(
      post: DataFrame,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val df = docFreq(post)
    val stats = post.select(col("doc_id"), col("doclen")).distinct()
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col("doclen")).as("avgdl"))

    val qTerms = queries
      .select(
        col(queryIdCol).as("query_id"),
        explode(array_distinct(split(trim(col(queryTextCol)), "\\s+")))
          .as("term"))
      .filter(length(col("term")) > 0)

    // idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the non-negative variant)
    // tf component = tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl))
    val scored = qTerms
      .join(post, "term")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(
        col("query_id"), col("doc_id"),
        (log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("doclen") / col("avgdl"))))
          .as("s"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("s")).as("s"))
      // cross-engine-stable ranking: rank on the ROUNDED score (summation
      // order and libm-vs-JVM ln can differ in the last ulps), ties by id
      .select(col("query_id"), col("doc_id"),
        (floor(col("s") * 1e4 + 0.5) / 1e4).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** Top-`k` characteristic terms per document by TF-IDF — the corpus
    * metadata op behind tagging/faceting and per-document keyword
    * summaries. Reuses the [[postings]] index (build once, persist,
    * serve); document frequency and the corpus size are O(vocab)/O(1)
    * aggregates broadcast into the scorer, so the only per-posting work
    * is a projection plus the per-document top-k window (partition-local,
    * bounded by document vocabulary — no global sort).
    *
    * Ranking is on the ROUNDED score (same posture as BM25: JVM `ln` and
    * libm `ln` can differ in the last ulps), ties by term ascending —
    * engine-deterministic, which is what lets the q60 oracle re-derive
    * the exact ranked list.
    */
  def topTfidfTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    topTfidfIndexed(postings(docs, idCol, textCol), k)

  /** [[topTfidfTerms]] against a prebuilt postings frame. */
  def topTfidfIndexed(post: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dfreq = docFreq(post)
    val n = post.select(col("doc_id")).distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    post
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (floor(col("tf") * log(col("n") / col("df")) * 1e4 + 0.5) / 1e4)
          .as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("term"), col("score"))
  }

  /** [[topTfidfTerms]] at GROUP granularity — corpus cartography: label
    * each cluster/partition/source with the terms most distinctive of
    * it. `assign` maps `doc_id` to `groupCol`; per-group term counts sum
    * the doc-level postings and the groups then play the document role
    * in the TF-IDF formula (df = #groups containing the term, n =
    * #groups), so a term every cluster shares scores ~0 and what
    * survives the top-k is each cluster's signature vocabulary.
    *
    * Scale shape: the postings join ships (doc_id, term, tf) rows once;
    * the per-group aggregation is map-side partial on (group, term);
    * everything after runs on O(groups × vocab) at most. Output:
    * `(doc_id = the group, rank, term, score)` — callers alias the
    * group column back.
    */
  def topTfidfTermsByGroup(
      post: DataFrame,
      assign: DataFrame,
      groupCol: String,
      k: Int): DataFrame =
    topTfidfIndexed(
      post.join(assign, Seq("doc_id"))
        .select(col(groupCol).as("doc_id"), col("term"), col("tf"))
        .groupBy("doc_id", "term")
        .agg(sum("tf").as("tf")),
      k)

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * combine heterogeneous retrievers (BM25 + embedding ANN = hybrid
    * search) without score calibration: each system contributes
    * `1 / (kRrf + rank)` per (query, doc), contributions sum, and the
    * fused top-`k` re-ranks on that. Rank-only fusion means the systems'
    * score scales never need reconciling, and the arithmetic is
    * engine-exact (reciprocals of small integers).
    *
    * Input frames need `(query_id, doc_id, rank)`; a doc absent from a
    * system simply contributes nothing. Cost is a union of the (already
    * tiny, top-k-bounded) result sets + one aggregation — nothing
    * touches corpus data.
    */
  def rrfFuse(results: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(results.nonEmpty, "rrfFuse needs at least one result set")
    require(k >= 1 && kRrf >= 0, s"bad k=$k kRrf=$kRrf")
    results
      .map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(kRrf) + col("rank"))).as("c")))
      .reduce(_ unionAll _)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("s"))
      .select(col("query_id"), col("doc_id"),
        (floor(col("s") * 1e6 + 0.5) / 1e6).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }
}
