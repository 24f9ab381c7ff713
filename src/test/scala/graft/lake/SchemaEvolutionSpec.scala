package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("readMerged unions generations; old files read null for new cols") {
    val root = Files.createTempDirectory("graft-evolve-").toString + "/t"
    // generation 1: (id, v); generation 2 adds source
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.parquet(s"$root/gen=1")
    Seq((3L, 30.0, "web")).toDF("id", "v", "source")
      .write.parquet(s"$root/gen=2")

    val df = SchemaEvolution.readMerged(spark, root)
    df.columns.toSet should contain allOf ("id", "v", "source")
    df.count() shouldBe 3
    df.filter(col("id") < 3).filter(col("source").isNull).count() shouldBe 2
    df.filter(col("id") === 3).select("source").head().getString(0) shouldBe "web"
  }

  test("conform: missing -> typed nulls, extra dropped, types cast") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType),
      StructField("source", StringType)))
    val legacy = Seq((1, "3.5", "x", true)).toDF("id", "v", "junk", "flag")
    val out = SchemaEvolution.conform(legacy, target)
    // names/types conform (nullability is data-dependent and may tighten)
    out.schema.fields.map(f => (f.name, f.dataType)) shouldBe
      target.fields.map(f => (f.name, f.dataType))
    val r = out.head()
    (r.getLong(0), r.getDouble(1)) shouldBe ((1L, 3.5))
    r.isNullAt(2) shouldBe true

    // strict mode surfaces drift instead of dropping it
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.conform(legacy, target, strict = true)
    }
    e.getMessage should include ("junk")
  }

  test("conform of a conforming frame is a no-op projection") {
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val df = Seq((1L, 2.0)).toDF("id", "v")
    SchemaEvolution.conform(df, target).collect() shouldBe df.collect()
  }
}
