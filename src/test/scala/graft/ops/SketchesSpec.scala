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
}
