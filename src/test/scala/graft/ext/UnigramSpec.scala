package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "ababab ababab cdcd" else "ababab cdcd xyz")
    }.toDF("doc_id", "text")
  }

  test("train learns the dominant multi-char pieces; Viterbi compresses") {
    val m = Unigram.train(corpus, "text", vocabSize = 24, maxPieceLen = 6)
    assert(m.pieces.size <= 24)
    val pieceSet = m.pieces.map(_._1).toSet
    // the repeated bigram survives pruning
    assert(pieceSet.exists(p => p.contains("ab") && p.length > 1),
      s"no multi-char ab piece in $pieceSet")
    import spark.implicits._
    val F = org.apache.spark.sql.functions
    val toks = corpus.select(m.encode(col("text")).as("t"))
      .select(F.size(col("t")).cast("long").as("n")).as[Long].collect()
    val chars = corpus
      .select(F.length(regexp_replace(col("text"), "\\s+", ""))
        .cast("long").as("n")).as[Long].collect()
    assert(toks.sum < chars.sum, s"${toks.sum} !< ${chars.sum}")
  }

  test("round-trip holds corpus-wide, including unseen characters") {
    import spark.implicits._
    val m = Unigram.train(corpus, "text", vocabSize = 24)
    val probe = corpus.union(
      Seq((100L, "zqü unseen€ chars")).toDF("doc_id", "text"))
    val bad = probe.select(
        concat_ws("", m.encode(col("text"))).as("joined"),
        regexp_replace(col("text"), "\\s+", "").as("squashed"))
      .filter(col("joined") =!= col("squashed"))
      .count()
    assert(bad === 0L)
  }

  test("save/load reproduces the encoding bit-for-bit") {
    import spark.implicits._
    val m = Unigram.train(corpus, "text", vocabSize = 24)
    val tmp = java.nio.file.Files.createTempDirectory("unigram").toString
    m.save(spark, s"$tmp/model")
    val loaded = Unigram.load(spark, s"$tmp/model")
    assert(loaded.pieces === m.pieces)
    val a = corpus.select(m.encode(col("text")).as("t"))
      .as[Seq[String]].collect().toSeq
    val b = corpus.select(loaded.encode(col("text")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(a === b)
  }

  test("property: Viterbi roundtrip holds for arbitrary unicode text " +
      "(surrogate pairs included) under an arbitrary trained model") {
    val m = Unigram.train(corpus, "text", vocabSize = 24)
    val expr = graft.functions.UnigramEncode(
      org.apache.spark.sql.GraftShim.expression(
        org.apache.spark.sql.functions.lit("x")),
      m.pieces, -100.0)
    // drive the expression's eval path directly — the property is about
    // the encoder's code-point handling, not the Spark plumbing
    assert(graft.Check.holds[String] { s =>
      val toks = expr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val joined = (0 until toks.numElements())
        .map(i => toks.getUTF8String(i).toString).mkString
      joined == s.trim.split("\\s+", -1).filter(_.nonEmpty).mkString
    })
  }

  test("training is deterministic run-to-run") {
    val a = Unigram.train(corpus, "text", vocabSize = 24).pieces
    val b = Unigram.train(corpus, "text", vocabSize = 24).pieces
    assert(a === b)
  }
}
