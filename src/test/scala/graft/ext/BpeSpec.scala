package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The classic Sennrich corpus, with hand-derived merge order:
    * pair counts round 1 put (e,s) and (s,t) tied at 9 — lexicographic
    * tie-break picks (e,s); then (es,t) at 9; then (l,o)/(o,w) tied at 7
    * → (l,o); then (lo,w) at 7.
    */
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).mkString(" ")

  test("train learns the hand-derived merge sequence") {
    val m = Bpe.train(Seq(corpus).toDF("text"), "text", numMerges = 4)
    m.merges shouldBe Seq(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
  }

  test("encode applies merges by rank, per word, greedy left-to-right") {
    val m = Bpe.train(Seq(corpus).toDF("text"), "text", numMerges = 4)
    val got = Seq("lowest low newest", "widest")
      .toDF("text")
      .select(m.encode(col("text")).as("t"))
      .collect()
      .map(_.getSeq[String](0))
    // lowest = l o w e s t -> es -> est -> lo -> low + est
    got(0) shouldBe Seq("low", "est", "low", "n", "e", "w", "est")
    got(1) shouldBe Seq("w", "i", "d", "est")
  }

  test("round-trip: concatenating a word's tokens rebuilds the word") {
    val m = Bpe.train(Seq(corpus).toDF("text"), "text", numMerges = 4)
    val docs = Seq("lowest slower nest", "wide widest low")
    val ok = docs.toDF("text")
      .select(
        concat_ws("", m.encode(col("text"))).as("joined"),
        regexp_replace(col("text"), "\\s+", "").as("squashed"))
      .collect()
    ok.foreach(r => r.getString(0) shouldBe r.getString(1))
  }

  test("char model counts non-whitespace code points; edge inputs") {
    val rows = Seq(
      ("a bc  def", 6), ("", 0), ("   ", 0), ("\tx\n y", 2))
    val got = rows.map(_._1).toDF("text")
      .select(Bpe.charModel.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0))
    got shouldBe rows.map(_._2).toArray
    // null in, null out
    val n = Seq[String](null).toDF("text")
      .select(Bpe.charModel.encode(col("text")).as("t")).collect()
    assert(n.head.isNullAt(0))
  }

  test("training caps the dictionary and stops when no pairs remain") {
    // single-char words only: zero mergeable pairs -> empty model
    val m = Bpe.train(Seq("a b c a b").toDF("text"), "text", numMerges = 10)
    m.merges shouldBe empty
    // cap keeps the most frequent forms deterministically
    val m2 = Bpe.train(
      Seq("aa aa aa zz").toDF("text"), "text",
      numMerges = 1, maxWordForms = 1)
    m2.merges shouldBe Seq(("a", "a"))
  }

  test("multi-byte text: merges operate on code points") {
    val m = Bpe.Model(Seq(("é", "t"), ("ét", "é")))
    val got = Seq("été αβ").toDF("text")
      .select(m.encode(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    got shouldBe Seq("été", "α", "β")
  }

  test("model save/load roundtrip preserves merge ORDER and encoding") {
    val corpus = Seq.fill(50)("low lower lowest newest widest")
      .toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 12)
    m.merges.size should be > 0
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpe-").toString + "/model"
    m.save(spark, path)
    val back = Bpe.load(spark, path)
    back.merges shouldBe m.merges // order included — rank is the priority
    val probe = Seq("lowest newest low").toDF("text")
    probe.select(back.encode(col("text"))).collect() shouldBe
      probe.select(m.encode(col("text"))).collect()
  }
}
