package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // rich-ish text that clears the quality floor
  private def good(i: Int) =
    s"document $i carries plenty of varied natural language tokens " +
      s"with disparate words nobody repeats elsewhere number$i marker$i"

  test("curate: dedups, floors quality, decontaminates, labels the rest") {
    val evalText = "held out benchmark question about unique trivia " +
      "fourteen distinct tokens appearing verbatim in one corpus document"
    val docs = Seq(
      (1L, good(1)),
      (2L, good(1)),              // exact dup of 1 -> dropped (min-id keeps 1)
      (3L, good(3)),
      (4L, "x x x x"),            // degenerate -> quality floor drops it
      (5L, s"prefix ${evalText} suffix"), // shares a 13-gram with eval
      (50L, evalText))            // the eval doc itself, present in corpus
      .toDF("doc_id", "text")
    val eval = Seq((50L, evalText)).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "doc_id", "text",
      eval, "doc_id", "text", minQuality = 0.5, nGram = 13, salt = "t")
      .collect()
    out.map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    out.foreach(r => Set("train", "val", "test") should contain(
      r.getString(1)))
  }

  test("curate: splits are the assignSplit labels (deterministic)") {
    val docs = (1L to 200L).map(i => (i, good(i.toInt))).toDF("doc_id", "text")
    val eval = Seq((9999L, "nothing shared with anything here at all"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "doc_id", "text",
      eval, "doc_id", "text", salt = "s7")
    val direct = Curation.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s7")
      .select("doc_id", "split")
    out.count() shouldBe 200L
    out.except(direct).count() shouldBe 0L
  }
}
