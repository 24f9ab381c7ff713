package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("metrics ride the action: rows, nulls, totals from one write") {
    val rec = Observe.register(spark)
    try {
      val df = Seq[(java.lang.Long, String)](
        (1L, "a"), (null, "b"), (3L, null), (4L, "d"))
        .toDF("k", "v")
      val out = Files.createTempDirectory("graft-observe-").toString + "/t"
      Observe.withMetrics(df, "load",
        count(lit(1)).as("rows"),
        sum(col("k").isNull.cast("long")).as("null_keys"),
        sum(coalesce(col("k"), lit(0L))).as("total"))
        .write.parquet(out)

      // the listener bus is async; the write's metrics arrive shortly
      org.scalatest.concurrent.Eventually.eventually(
        org.scalatest.concurrent.Eventually.timeout(
          org.scalatest.time.Span(10, org.scalatest.time.Seconds))) {
        val got = rec.captured("load")
        got should have size 1
        got.head.metrics("rows") shouldBe 4L
        got.head.metrics("null_keys") shouldBe 1L
        got.head.metrics("total") shouldBe 8L
      }
    } finally Observe.unregister(spark, rec)
  }

  test("multiple observe points on one plan are captured separately") {
    val rec = Observe.register(spark)
    try {
      val base = Observe.withMetrics(
        spark.range(100).toDF("id"), "raw", count(lit(1)).as("n"))
      val filtered = Observe.withMetrics(
        base.filter(col("id") % 2 === 0), "kept", count(lit(1)).as("n"))
      filtered.count() shouldBe 50

      org.scalatest.concurrent.Eventually.eventually(
        org.scalatest.concurrent.Eventually.timeout(
          org.scalatest.time.Span(10, org.scalatest.time.Seconds))) {
        rec.captured("raw").head.metrics("n") shouldBe 100L
        rec.captured("kept").head.metrics("n") shouldBe 50L
      }
    } finally Observe.unregister(spark, rec)
  }
}
