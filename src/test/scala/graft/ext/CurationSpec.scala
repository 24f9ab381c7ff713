package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("packTokenBudget matches a sequential reference on a random corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(graft.Check.PinnedSeed)
    val docs = (0L until 500L).map { id =>
      (id, Seq.fill(1 + rng.nextInt(40))("w").mkString(" "))
    }
    val out = Curation.packTokenBudget(
      docs.toDF("doc_id", "text"), "doc_id", "text", budgetTokens = 100)
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    var prefix = 0L
    docs.foreach { case (id, text) =>
      val n = text.split("\\s+").length.toLong
      val expectedBin = prefix / 100
      val row = out.find(_._1 == id).get
      assert(row._2 === n, s"token count for $id")
      assert(row._3 === expectedBin, s"bin for $id")
      prefix += n
    }
  }

  test("packTokenBudget bins are invariant to input partitioning") {
    import spark.implicits._
    val docs = (0L until 300L).map(id => (id, ("tok " * (1 + (id % 37).toInt)).trim))
    val df = docs.toDF("doc_id", "text")
    def bins(d: org.apache.spark.sql.DataFrame) =
      Curation.packTokenBudget(d, "doc_id", "text", 64)
        .as[(Long, Long, Long)].collect().toSet
    assert(bins(df.repartition(1)) === bins(df.repartition(7)))
  }

  test("stratifiedSample is deterministic, respects strata, ~hits fractions") {
    import spark.implicits._
    val rows = (0L until 4000L)
      .map(id => (id, Seq("en", "de", "fr", "zh")((id % 4).toInt)))
    val df = rows.toDF("doc_id", "lang")
    val fr = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.0)
    def sample() = Curation.stratifiedSample(df, "doc_id", "lang", fr)
      .as[(Long, String)].collect().toSet
    val s1 = sample()
    assert(s1 === sample()) // bit-for-bit reproducible
    assert(!s1.exists(_._2 == "fr")) // fraction 0
    assert(!s1.exists(_._2 == "zh")) // stratum not in the map
    val en = s1.count(_._2 == "en").toDouble / 1000
    val de = s1.count(_._2 == "de").toDouble / 1000
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(de - 0.25) < 0.05, s"de rate $de")
  }

  test("keepThresholdHex edges: 0 keeps nothing, 1 keeps everything") {
    import spark.implicits._
    val df = (0L until 200L).map((_, "en")).toDF("doc_id", "lang")
    assert(Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.0)).count() === 0L)
    assert(Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 1.0)).count() === 200L)
  }
}
