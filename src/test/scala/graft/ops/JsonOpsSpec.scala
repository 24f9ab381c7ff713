package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.JsonOps._

class JsonOpsSpec extends SparkSpec {

  private def heterogeneous = {
    import spark.implicits._
    Seq(
      (1L, """{"a": 1, "b": "x"}"""),
      (2L, """{"b": "y", "c": true}"""),
      (3L, """{"a": 7}"""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "props")
  }

  test("G1 explode on heterogeneous JSON surfaces the union of fields") {
    import spark.implicits._
    val out = heterogeneous.explodeJsonColumn("props")
    // inference returns the union of top-level fields, alphabetical
    assert(out.columns.toSeq === Seq("id", "a", "b", "c"))
    val rows = out.orderBy("id")
      .as[(Long, Option[String], Option[String], Option[String])].collect()
    assert(rows(0) === ((1L, Some("1"), Some("x"), None)))
    assert(rows(1) === ((2L, None, Some("y"), Some("true"))))
    assert(rows(2) === ((3L, Some("7"), None, None)))
    assert(rows(3) === ((4L, None, None, None)))
  }

  test("G1 prefix and snake_case options compose") {
    val out = heterogeneous
      .withColumnRenamed("props", "p")
      .explodeJsonColumn("p", prefix = "prop_", formatColumnNames = true)
    assert(out.columns.forall(c => c == "id" || c.startsWith("prop_")))
  }

  test("G1 Fields mode needs no inference pass and keeps declared order") {
    val out = heterogeneous.explodeJsonColumn(
      "props", schema = JsonSchema.Fields(Seq("c", "a")))
    assert(out.columns.toSeq === Seq("id", "c", "a"))
  }

  test("G1 InferSample(n) behaves like full inference on a small column") {
    val full = heterogeneous.explodeJsonColumn("props")
    val sampled = heterogeneous.explodeJsonColumn(
      "props", schema = JsonSchema.InferSample(10))
    assert(full.columns.toSeq === sampled.columns.toSeq)
  }

  test("G1 rejects a missing column with a clear error") {
    val e = intercept[IllegalArgumentException] {
      heterogeneous.explodeJsonColumn("nope")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("explode ∘ to_json round-trips a struct's scalar fields") {
    import spark.implicits._
    val df = Seq((1L, (5, "v"))).toDF("id", "s")
      .select(col("id"), to_json(col("s")).as("j"))
    val out = df.explodeJsonColumn("j")
    assert(out.orderBy("id").as[(Long, String, String)].head() === ((1L, "5", "v")))
  }

  test("G1 a JSON field named like the source column survives the explode") {
    import spark.implicits._
    // regression: the old implementation dropped the source column by name
    // AFTER appending generator outputs, destroying an extracted field "j"
    // living in a column also named "j"
    val df = Seq((1L, """{"j": "inner", "k": "other"}""")).toDF("id", "j")
    val out = df.explodeJsonColumn("j")
    assert(out.columns.toSeq === Seq("id", "j", "k"))
    assert(out.select("j", "k").as[(String, String)].head() === (("inner", "other")))
  }

  test("explode ∘ to_json round-trips random flat string maps (property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_json}
    // lowercase keys: JSON extraction is case-SENSITIVE but Row.getAs
    // resolves case-insensitively (spark.sql.caseSensitive=false), so
    // case-colliding keys cannot be asserted through the Row API
    val keyGen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.alphaLowerChar).map(_.mkString.take(8))
    // unpaired UTF-16 surrogates cannot round-trip through UTF-8 JSON
    // (they become replacement chars); quotes/backslashes/control chars
    // remain in the generator and cover the escaping paths
    val valueGen = org.scalacheck.Arbitrary.arbitrary[String]
      .suchThat(s => !s.exists(Character.isSurrogate))
    val entryGen = org.scalacheck.Gen.zip(keyGen, valueGen)
    val mapGen = org.scalacheck.Gen.mapOfN(3, entryGen)
      .suchThat(_.nonEmpty)
    val prop = org.scalacheck.Prop.forAll(mapGen) { m =>
      val df = Seq(1L).toDF("id")
        .withColumn("j", to_json(org.apache.spark.sql.functions.map(
          m.toSeq.flatMap { case (k, v) =>
            Seq(org.apache.spark.sql.functions.lit(k),
              org.apache.spark.sql.functions.lit(v))
          }: _*)))
      val out = df.explodeJsonColumn("j",
        schema = JsonSchema.Fields(m.keys.toSeq))
      val row = out.head()
      m.forall { case (k, v) => Option(row.getAs[String](k)).contains(v) }
    }
    // 500 cases, pinned seed: the key generator only rarely emits a field
    // named like the source column ("j"), which is exactly the collision
    // the old drop-by-name bug destroyed — determinism keeps the round
    // outcome reproducible while the case count keeps the coverage.
    assert(org.scalacheck.Test.check(
      graft.Check.params.withMinSuccessfulTests(500),
      prop).passed)
  }
}
