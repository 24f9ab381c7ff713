package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 segments sharing overlapping id ranges: union must dedup across
  // segments (10k distinct overall, NOT the 18k row sum)
  private lazy val df = (
    (1 to 8000).map(i => ("a", i.toLong)) ++
      (4001 to 12000).map(i => ("b", i.toLong)) ++
      (9001 to 11000).map(i => ("c", i.toLong)))
    .toDF("seg", "id")

  test("global estimate within HLL error of true distinct, exact row sum") {
    val sk = Sketches.buildSegmentSketches(df, Seq("seg"), "id")
    sk.count() shouldBe 3L
    val row = Sketches.estimateDistinct(sk, Nil).head()
    row.getLong(1) shouldBe 18000L
    row.getLong(0).toDouble shouldBe 12000.0 +- 12000 * 0.05
  }

  test("sketch-of-parts union == sketch-of-whole (mergeability, exactly)") {
    val parts = Sketches.estimateDistinct(
      Sketches.buildSegmentSketches(df, Seq("seg"), "id"), Nil)
      .head().getLong(0)
    val whole = Sketches.estimateDistinct(
      Sketches.buildSegmentSketches(
        df.withColumn("one", lit("x")), Seq("one"), "id"), Nil)
      .head().getLong(0)
    parts shouldBe whole
  }

  test("sketches survive a parquet round-trip and still union") {
    val path = Files.createTempDirectory("graft-sk-").toString + "/sk"
    Sketches.buildSegmentSketches(df, Seq("seg"), "id")
      .write.parquet(path)
    val back = spark.read.parquet(path)
    Sketches.estimateDistinct(back, Nil).head()
      .getLong(0).toDouble shouldBe 12000.0 +- 12000 * 0.05
    // rollup to a subset of segments works off the persisted table
    val ab = Sketches.estimateDistinct(
      back.filter(col("seg").isin("a", "b")), Nil).head().getLong(0)
    ab.toDouble shouldBe 12000.0 +- 12000 * 0.05
  }

  test("per-group rollup keeps segment grain independent") {
    val sk = Sketches.buildSegmentSketches(df, Seq("seg"), "id")
    val per = Sketches.estimateDistinct(sk, Seq("seg"))
      .orderBy("seg").collect()
    per.map(_.getString(0)) shouldBe Array("a", "b", "c")
    per(0).getLong(1).toDouble shouldBe 8000.0 +- 8000 * 0.05
    per(2).getLong(1).toDouble shouldBe 2000.0 +- 2000 * 0.05
  }

  // quantile sketches: values 1..18000 with known exact quantiles
  private lazy val qdf = (
    (1 to 6000).map(i => ("a", i.toDouble)) ++
      (6001 to 12000).map(i => ("b", i.toDouble)) ++
      (12001 to 18000).map(i => ("c", i.toDouble)))
    .toDF("seg", "v")

  test("quantile sketches: merged rollup within the rank-error bound") {
    val sk = Sketches.buildQuantileSketches(qdf, Seq("seg"), "v",
      relativeError = 0.01)
    sk.count() shouldBe 3L
    val row = Sketches.estimateQuantiles(sk, Nil, Seq(0.25, 0.5, 0.9))
      .head()
    row.getLong(1) shouldBe 18000L
    val Seq(q25, q50, q90) = row.getSeq[Double](0).toSeq
    // rank error <= 2 * eps * n = 360 ranks; values are 1:1 with ranks
    q25 shouldBe 4500.0 +- 400.0
    q50 shouldBe 9000.0 +- 400.0
    q90 shouldBe 16200.0 +- 400.0
  }

  test("quantile sketches: survive parquet, per-group probes independent") {
    val path = Files.createTempDirectory("graft-qsk-").toString + "/q"
    Sketches.buildQuantileSketches(qdf, Seq("seg"), "v").write.parquet(path)
    val back = spark.read.parquet(path)
    val per = Sketches.estimateQuantiles(back, Seq("seg"), Seq(0.5))
      .orderBy("seg").collect()
    per.map(_.getString(0)) shouldBe Array("a", "b", "c")
    per(0).getSeq[Double](1).head shouldBe 3000.0 +- 150.0
    per(2).getSeq[Double](1).head shouldBe 15000.0 +- 150.0
    // rollup of a SUBSET of persisted segments, no raw data touched
    val ab = Sketches.estimateQuantiles(
      back.filter(col("seg").isin("a", "b")), Nil, Seq(0.5)).head()
    ab.getSeq[Double](0).head shouldBe 6000.0 +- 300.0
  }

  test("quantile sketch of nothing probes to an empty array") {
    val sk = Sketches.buildQuantileSketches(
      qdf.filter(col("v") < 0), Seq("seg"), "v")
    sk.count() shouldBe 0L
    // merge over zero rows still yields a (empty) sketch row globally
    val row = Sketches.estimateQuantiles(sk, Nil, Seq(0.5)).head()
    row.getSeq[Double](0) shouldBe Seq.empty
  }
}
