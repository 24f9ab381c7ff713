package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interchange-format writes (TableWriter.Spec.formatOverride): ORC keeps
  * the columnar read-path properties (pushdown + pruning), CSV is the
  * typed-schema-less edge handoff.
  */
class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-ix-").toString

  private val df = Seq(
    (1L, "a", 10.5, "2024-03-01"),
    (2L, "b", 3.25, "2024-03-01"),
    (3L, "a", 7.0, "2024-03-02"))
    .toDF("id", "k", "v", "day")

  test("ORC override: values and schema survive the round-trip") {
    val path = s"$root/orc1"
    TableWriter.write(df, TableWriter.Spec(Layer.Dw, path,
      formatOverride = Some(StorageFormat.orcZstd)))
    val back = spark.read.orc(path)
    // names + types survive; nullability widens to true on read (ORC has
    // no not-null column metadata) — expected, not a fidelity loss
    back.schema.fields.map(f => (f.name, f.dataType)) shouldBe
      df.schema.fields.map(f => (f.name, f.dataType))
    back.orderBy("id").collect() shouldBe df.orderBy("id").collect()
    assert(new java.io.File(path).listFiles().exists(_.getName.endsWith(".orc")))
  }

  test("ORC scan: filters push down and unread columns prune") {
    val path = s"$root/orc2"
    TableWriter.write(df, TableWriter.Spec(Layer.Dw, path,
      formatOverride = Some(StorageFormat.orcZstd)))
    val q = spark.read.orc(path).filter(col("id") > 1L).select("id", "v")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"),
      scan)
    assert(scan.contains("ReadSchema: struct<id:bigint,v:double>"), scan)
    q.count() shouldBe 2L
  }

  test("ORC override: Hive-style partitioning still applies") {
    val path = s"$root/orc3"
    TableWriter.write(df, TableWriter.Spec(Layer.Dw, path,
      partitionBy = Seq("day"),
      formatOverride = Some(StorageFormat.orcZstd)))
    assert(new java.io.File(s"$path/day=2024-03-01").isDirectory)
    // partition pruning: only one directory scanned
    val q = spark.read.orc(path).filter(col("day") === "2024-03-02")
    q.count() shouldBe 1L
  }

  test("CSV override: header handoff, values stringly but complete") {
    val path = s"$root/csv1"
    TableWriter.write(df, TableWriter.Spec(Layer.Dw, path,
      formatOverride = Some(StorageFormat.csvHeader)))
    val back = spark.read.option("header", "true").csv(path)
    back.columns shouldBe df.columns
    back.count() shouldBe 3L
    back.filter(col("id") === "2").select("v").head().getString(0) shouldBe
      "3.25"
  }

  test("no override: layer policy unchanged (parquet for Dw)") {
    val path = s"$root/pq1"
    TableWriter.write(df, TableWriter.Spec(Layer.Dw, path))
    assert(new java.io.File(path).listFiles()
      .exists(_.getName.endsWith(".parquet")))
  }
}
