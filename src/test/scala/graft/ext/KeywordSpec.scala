package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeywordSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "durian durian durian durian")
  ).toDF("doc_id", "text")

  test("postings carry tf and doclen; empty docs and tokens drop") {
    val p = Keyword.postings(
      corpus.union(Seq((4L, "   "), (5L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")),
      "doc_id", "text")
      .orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    p shouldBe Array(
      (1L, 3, "apple", 2L), (1L, 3, "banana", 1L),
      (2L, 2, "banana", 1L), (2L, 2, "cherry", 1L),
      (3L, 4, "durian", 4L))
  }

  test("docFreq counts documents, not occurrences") {
    val df = Keyword.docFreq(Keyword.postings(corpus, "doc_id", "text"))
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    df shouldBe Array(("apple", 1L), ("banana", 2L), ("cherry", 1L), ("durian", 1L))
  }

  test("searchBM25 matches the hand formula and ranks rare terms higher") {
    val queries = Seq((100L, "apple banana")).toDF("qid", "qtext")
    val got = Keyword.searchBM25(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 3)
      .orderBy("rank")
      .select("doc_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

    // hand BM25: N=3, avgdl=3; k1=1.2, b=0.75
    def idf(dfc: Double) = math.log((3 - dfc + 0.5) / (dfc + 0.5) + 1)
    def tfc(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val d1 = r4(idf(1) * tfc(2, 3) + idf(2) * tfc(1, 3)) // apple + banana
    val d2 = r4(idf(2) * tfc(1, 2))                      // banana only

    got.map(_._1) shouldBe Array(1L, 2L) // doc 3 matches nothing
    got(0)._2 shouldBe d1 +- 1e-9
    got(1)._2 shouldBe d2 +- 1e-9
    // the doc matching the RARE term (apple, df=1) outranks common-only
    assert(got(0)._2 > got(1)._2)
  }

  test("searchBM25Indexed over a persisted postings table matches one-shot") {
    val queries = Seq((100L, "apple banana"), (101L, "durian")).toDF("qid", "qtext")
    val oneShot = Keyword.searchBM25(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 3)
      .select("query_id", "doc_id", "rank", "score")
      .collect().map(_.toSeq).toSet
    // round-trip the index through parquet, as a serving path would
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-").toString
    Keyword.postings(corpus, "doc_id", "text").write.parquet(s"$dir/post")
    val served = Keyword.searchBM25Indexed(
      spark.read.parquet(s"$dir/post"), queries, "qid", "qtext", k = 3)
      .select("query_id", "doc_id", "rank", "score")
      .collect().map(_.toSeq).toSet
    served shouldBe oneShot
  }

  test("rrfFuse: hand-computed fusion, one-system docs, determinism") {
    val sysA = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val sysB = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Keyword.rrfFuse(Seq(sysA, sysB), k = 3, kRrf = 60)
      .orderBy("rank")
      .select("doc_id", "rrf", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 11: in both (rank 2 + rank 1) beats doc 10 (single rank 1)
    got.map(_._1) shouldBe Array(11L, 10L, 12L)
    got(0)._2 shouldBe r6(1.0 / 62 + 1.0 / 61)
    got(1)._2 shouldBe r6(1.0 / 61)
    got(2)._2 shouldBe r6(1.0 / 62)
  }

  test("duplicate query terms score once (bag-of-words query)") {
    val q1 = Seq((1L, "banana")).toDF("qid", "qtext")
    val q2 = Seq((1L, "banana banana banana")).toDF("qid", "qtext")
    def run(q: org.apache.spark.sql.DataFrame) =
      Keyword.searchBM25(corpus, "doc_id", "text", q, "qid", "qtext", k = 5)
        .select("doc_id", "score").orderBy("doc_id").collect().toSeq
    run(q1) shouldBe run(q2)
  }

  test("topTfidfTerms: hand formula, rank order, corpus-wide term scores 0") {
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val got = Keyword.topTfidfTerms(corpus, "doc_id", "text", k = 5)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    // doc 1: apple tf=2 df=1 → 2·ln(3); banana tf=1 df=2 → ln(1.5)
    got(1L) shouldBe Seq(
      ("apple", r4(2 * math.log(3.0))), ("banana", r4(math.log(1.5))))
    // doc 3: durian tf=4 df=1 → 4·ln(3), its only term
    got(3L) shouldBe Seq(("durian", r4(4 * math.log(3.0))))
    // doc 2: cherry (rare) outranks banana (shared)
    got(2L).map(_._1) shouldBe Seq("cherry", "banana")
  }

  test("topTfidfTerms: k bounds output per doc, ties break on term asc") {
    val tied = Seq((1L, "aaa bbb"), (2L, "zzz")).toDF("doc_id", "text")
    val got = Keyword.topTfidfTerms(tied, "doc_id", "text", k = 1)
      .as[(Long, Int, String, Double)].collect().sortBy(_._1).toSeq
    got.map(t => (t._1, t._3)) shouldBe Seq((1L, "aaa"), (2L, "zzz"))
    got.map(_._2) shouldBe Seq(1, 1)
  }

  test("topTfidfIndexed over persisted postings matches one-shot") {
    val dir = java.nio.file.Files.createTempDirectory("tfidf_post").toString
    Keyword.postings(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val fromIndex = Keyword.topTfidfIndexed(spark.read.parquet(dir), k = 5)
      .as[(Long, Int, String, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    val oneShot = Keyword.topTfidfTerms(corpus, "doc_id", "text", k = 5)
      .as[(Long, Int, String, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    fromIndex shouldBe oneShot
  }

  test("topTfidfTermsByGroup: each group's signature term ranks first, " +
      "vocabulary shared by every group scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared algebra algebra theorem"),
      (2L, "shared algebra lemma"),
      (3L, "shared striker striker goal"),
      (4L, "shared striker penalty")).toDF("doc_id", "text")
    val assign = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1))
      .toDF("doc_id", "cell")
    val out = Keyword.topTfidfTermsByGroup(
        Keyword.postings(docs, "doc_id", "text"), assign, "cell", k = 2)
      .as[(Int, Int, String, Double)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out.filter(_._1 == 0).head._3 === "algebra")
    assert(out.filter(_._1 == 1).head._3 === "striker")
    // 'shared' lives in both groups -> ln(2/2) = 0, never in the top-2
    assert(!out.exists(_._3 == "shared"))
    out.foreach(t => assert(t._4 > 0.0))
  }
}
