package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("train counts every positional gram, not the distinct set") {
    val m = LanguageModel.train(docs(1L -> "ababa"), col("text"), n = 3)
      .as[(String, Long)].collect().toMap
    // positions: aba, bab, aba
    m shouldBe Map("aba" -> 2L, "bab" -> 1L)
  }

  test("context counts are the prefix sums of the gram counts") {
    val m = LanguageModel.train(docs(1L -> "ababa", 2L -> "abc"), col("text"), n = 3)
    val ctx = LanguageModel.contextCounts(m, 3)
      .as[(String, Long)].collect().toMap
    // grams: aba x2, bab, abc -> contexts ab: 2+1, ba: 1
    ctx shouldBe Map("ab" -> 3L, "ba" -> 1L)
  }

  test("score matches the hand-computed add-k likelihood") {
    val d = docs(1L -> "abab")
    val m = LanguageModel.train(d, col("text"), n = 3)
    // grams of "abab": aba(cnt 1), bab(cnt 1); contexts ab->1, ba->1
    // p = (1 + 0.5) / (1 + 0.5*64) = 1.5/33 for both grams
    val expected = -math.log(1.5 / 33.0)
    val row = LanguageModel.score(d, Seq("doc_id"), col("text"), m)
      .select("n_grams", "avg_nll", "ppl").as[(Long, Double, Double)]
      .collect().head
    row._1 shouldBe 2L
    row._2 shouldBe expected +- 1e-12
    row._3 shouldBe math.exp(expected) +- 1e-12
  }

  test("unseen grams smooth to k/(ctx + kV); unseen contexts to uniform") {
    val train = docs(1L -> "aaaa")   // model: aaa cnt 2; ctx aa -> 2
    val m = LanguageModel.train(train, col("text"), n = 3)
    // "aab": gram aab unseen, context aa seen -> (0+0.5)/(2+32)
    // "bbb": gram + context unseen -> 0.5/(0+32) = 1/64 uniform backoff
    val out = LanguageModel.score(
      docs(10L -> "aab", 11L -> "bbb"), Seq("doc_id"), col("text"), m)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    out(10L) shouldBe -math.log(0.5 / 34.0) +- 1e-12
    out(11L) shouldBe -math.log(1.0 / 64.0) +- 1e-12
  }

  test("in-distribution text scores lower perplexity than gibberish") {
    val trusted = docs((1L to 40L).map(i =>
      i -> "the quick brown fox jumps over the lazy dog again and again"): _*)
    val m = LanguageModel.train(trusted, col("text"), n = 3)
    val out = LanguageModel.score(
      docs(100L -> "the quick brown fox jumps over the dog",
           101L -> "zxqj vvkw qqpz jxxw zzkv qwwx pzzj xkvq"),
      Seq("doc_id"), col("text"), m)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    out(100L) should be < out(101L) / 4.0
  }

  test("filterByPerplexity keeps exactly the under-threshold documents") {
    val trusted = docs((1L to 20L).map(i =>
      i -> "plain english text with ordinary characters throughout"): _*)
    val m = LanguageModel.train(trusted, col("text"), n = 3)
    val candidates = docs(
      1000L -> "plain english text with ordinary words",
      1001L -> "qzxj wvvk ppqz jxxw kzzv")
    val scored = LanguageModel.score(
      candidates, Seq("doc_id"), col("text"), m)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    val cut = (scored(1000L) + scored(1001L)) / 2
    LanguageModel.filterByPerplexity(
      candidates, Seq("doc_id"), col("text"), m, maxPpl = cut)
      .select("doc_id").as[Long].collect() shouldBe Array(1000L)
  }

  test("minCount prunes rare grams; maxVocab caps deterministically") {
    val d = docs(1L -> "aaaaab")
    // grams: aaa x3, aab x1
    LanguageModel.train(d, col("text"), n = 3, minCount = 2)
      .as[(String, Long)].collect().toMap shouldBe Map("aaa" -> 3L)
    LanguageModel.train(d, col("text"), n = 3, maxVocab = 1)
      .as[(String, Long)].collect().toMap shouldBe Map("aaa" -> 3L)
  }

  test("documents shorter than n produce no score row") {
    val m = LanguageModel.train(docs(1L -> "abcd"), col("text"), n = 3)
    LanguageModel.score(docs(5L -> "ab"), Seq("doc_id"), col("text"), m)
      .count() shouldBe 0L
  }

  test("perplexityBuckets: per-language balanced tiers, head = lowest nll") {
    // two "languages": lang a fluent-ish repeats, lang b mixes in noise
    val rows = (0 until 12).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text =
        if (i < 8) s"the cat sat on the mat number $i"
        else s"zq${i}xv jkw qpzzt $i wvxk"
      (i.toLong, text, lang)
    }
    val d = rows.toDF("doc_id", "text", "lang")
    val m = LanguageModel.train(d, col("text"), n = 3)
    val out = LanguageModel.perplexityBuckets(
        d, "doc_id", col("text"), "lang", m)
      .as[(Long, String, Long, Double, Int, String)].collect()
    out.length shouldBe 12
    // equal-frequency fill: each language's 6 docs split 2/2/2
    out.groupBy(r => (r._2, r._5)).view.mapValues(_.length).toMap.values
      .foreach(_ shouldBe 2)
    // tier labels follow the bucket
    out.foreach { r =>
      r._6 shouldBe (r._5 match {
        case 1 => "head"; case 2 => "middle"; case _ => "tail" })
    }
    // within every language, max head nll <= min tail nll
    out.groupBy(_._2).foreach { case (_, g) =>
      g.filter(_._5 == 1).map(_._4).max should be <=
        g.filter(_._5 == 3).map(_._4).min
    }
    // the noise docs land in their language's tail
    out.filter(_._1 >= 8).foreach(_._6 shouldBe "tail")
  }

  test("model save/load round-trips and scores identically") {
    val d = docs(1L -> "abcabcabc")
    val m = LanguageModel.train(d, col("text"), n = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-lm").resolve("model").toString
    LanguageModel.save(m, path)
    val reloaded = LanguageModel.load(spark, path)
    val a = LanguageModel.score(d, Seq("doc_id"), col("text"), m)
      .select("avg_nll").as[Double].collect().head
    val b = LanguageModel.score(d, Seq("doc_id"), col("text"), reloaded)
      .select("avg_nll").as[Double].collect().head
    b shouldBe a
  }
}
