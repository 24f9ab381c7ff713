package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(root: String): Unit =
    Seq(
      ("2024-01-01", 1L), ("2024-01-02", 2L),
      ("2024-01-03", 3L), ("2024-01-10", 4L))
      .toDF("dt", "v")
      .write.partitionBy("dt").parquet(root)

  test("expirePartitions: dry run plans, real run deletes, data survives") {
    val root = Files.createTempDirectory("graft-retention-").toString + "/t"
    mkTable(root)

    val planned = Retention.expirePartitions(
      spark, root, "dt", cutoff = "2024-01-03", dryRun = true)
    planned shouldBe Seq("2024-01-01", "2024-01-02")
    spark.read.parquet(root).count() shouldBe 4 // dry run touched nothing

    val deleted = Retention.expirePartitions(
      spark, root, "dt", cutoff = "2024-01-03")
    deleted shouldBe Seq("2024-01-01", "2024-01-02")
    val left = spark.read.parquet(root)
    left.count() shouldBe 2
    left.select("dt").as[String].collect().sorted shouldBe
      Array("2024-01-03", "2024-01-10")
    // idempotent: nothing left below the cutoff
    Retention.expirePartitions(spark, root, "dt", "2024-01-03") shouldBe empty
  }

  test("expirePartitions on a missing table is a no-op") {
    Retention.expirePartitions(spark, "/tmp/graft-no-such-table", "dt",
      "2024-01-01") shouldBe empty
  }

  test("compactPartition shrinks file count, keeps rows byte-identical") {
    val root = Files.createTempDirectory("graft-compact-").toString + "/t"
    val part = s"$root/dt=2024-01-01"
    (1L to 1000L).toDF("v").repartition(20)
      .write.parquet(part)

    val beforeRows = spark.read.parquet(part)
      .orderBy("v").as[Long].collect()
    val (before, after) = Retention.compactPartition(spark, part, 500L)
    before shouldBe 20
    after should be <= 2
    spark.read.parquet(part).orderBy("v").as[Long].collect() shouldBe beforeRows
    // the swap left no scratch dirs behind
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(part + "._next")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(part + "._bak")) shouldBe false
  }

  test("q97 declared query: compaction leaves exactly one data file " +
      "and the shrink verdict is true on every row") {
    // the CORRECTNESS row proves value neutrality; this pins the physical
    // outcome — 40 shards at this row count compact to a single file
    val df = graft.SparkEntry.queries("q97_compaction")(
      spark, "/root/testdata/sf0.001")
    df.select("compacted").distinct().as[Boolean].collect() shouldBe
      Array(true)
    val part = new java.io.File(
      graft.Scratch.ephemeralDir("q97"), "t/seg=ALL")
    // hadoop's hidden-file convention: skip _SUCCESS AND the .crc
    // sidecars java.io.File shows but FileSystem.listStatus hides
    part.listFiles().count(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")) shouldBe 1
  }

  test("smallFileReport flags only partitions above the threshold") {
    val root = Files.createTempDirectory("graft-report-").toString + "/t"
    (1L to 100L).toDF("v").repartition(10)
      .write.parquet(s"$root/dt=2024-01-01")
    (1L to 100L).toDF("v").coalesce(1)
      .write.parquet(s"$root/dt=2024-01-02")

    Retention.smallFileReport(spark, root, maxFiles = 5) shouldBe
      Seq(("dt=2024-01-01", 10))
  }
}
