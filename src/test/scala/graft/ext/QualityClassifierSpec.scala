package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // positives: varied plain sentences; negatives: keyword-stuffed spam
  private val goodWords = Seq("the", "cat", "sat", "on", "a", "mat", "and",
    "looked", "out", "of", "the", "window", "at", "rain")
  private def goodDoc(i: Int) =
    (0 until 12).map(j => goodWords((i * 7 + j * 3) % goodWords.size))
      .mkString(" ")
  private def spamDoc(i: Int) =
    Seq.fill(12)(s"buyword${i % 3}").mkString(" ")

  private def corpus(ids: Range) = ids.map { i =>
    if (i % 2 == 0) (i.toLong, goodDoc(i), 1) else (i.toLong, spamDoc(i), 0)
  }.toDF("id", "text", "label")

  test("learns to separate spam from text and generalizes to held-out docs") {
    val m = QualityClassifier.train(
      corpus(0 until 80), col("text"), col("label"), dims = 512, epochs = 40)
    val eval = corpus(80 until 120)
    val acc = QualityClassifier.score(eval, col("text"), m)
      .select(((col("quality_prob") >= 0.5).cast("int") === col("label"))
        .cast("int").as("ok"))
      .agg(avg("ok")).as[Double].collect().head
    acc shouldBe 1.0
  }

  test("keepGood keeps exactly the above-threshold rows") {
    val m = QualityClassifier.train(
      corpus(0 until 80), col("text"), col("label"), dims = 512, epochs = 40)
    val eval = corpus(80 until 100)
    val kept = QualityClassifier.keepGood(eval, col("text"), m)
      .select("id").as[Long].collect().sorted
    kept shouldBe (80 until 100).filter(_ % 2 == 0).map(_.toLong).toArray
  }

  test("model round-trips through its DataFrame form") {
    val m = QualityClassifier.train(
      corpus(0 until 40), col("text"), col("label"), dims = 64, epochs = 5)
    val back = QualityClassifier.Model.fromDF(m.toDF(spark))
    back.dims shouldBe m.dims
    back.bias shouldBe m.bias
    back.weights shouldBe m.weights
    back.countCap shouldBe m.countCap
  }

  test("legacy artifacts (no cap row) load as RAW counts, as trained") {
    // models persisted before the saturation cap carried no idx=-2 row and
    // were trained on raw counts — defaulting the missing row to anything
    // else would be a silent train/serve skew on every reload
    val m = QualityClassifier.train(
      corpus(0 until 40), col("text"), col("label"), dims = 64, epochs = 5)
    val legacy = m.toDF(spark).filter(col("idx") =!= -2)
    QualityClassifier.Model.fromDF(legacy).countCap shouldBe 0
  }

  test("bias sentinel works: constant-label corpus drives bias, not weights") {
    // all-positive corpus: the optimum pushes bias up; with l2 pinning
    // weights, bias must end clearly positive
    val d = (0 until 20).map(i => (i.toLong, goodDoc(i), 1))
      .toDF("id", "text", "label")
    val m = QualityClassifier.train(d, col("text"), col("label"),
      dims = 64, epochs = 30)
    m.bias should be > 0.1
  }

  test("train tolerates null-text rows and excludes them from the gradient") {
    // a null text tokenizes to a null idx array — such rows must be
    // dropped (not NPE) and must not count toward n: the model trained
    // with nulls mixed in equals the model trained on the non-null rows
    val clean = corpus(0 until 40)
    val withNulls = clean.unionByName(
      Seq((1000L, null.asInstanceOf[String], 1),
          (1001L, null.asInstanceOf[String], 0))
        .toDF("id", "text", "label"))
    val mClean = QualityClassifier.train(
      clean, col("text"), col("label"), dims = 64, epochs = 5)
    val mNulls = QualityClassifier.train(
      withNulls, col("text"), col("label"), dims = 64, epochs = 5)
    mNulls.bias shouldBe mClean.bias
    mNulls.weights shouldBe mClean.weights
  }

  test("score is a pure projection (no shuffle in the plan)") {
    val m = QualityClassifier.Model(Seq.fill(64)(0.1), 0.0, 64)
    val plan = QualityClassifier.score(
      corpus(0 until 10), col("text"), m)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
