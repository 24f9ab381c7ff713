package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ColumnOps._

class ColumnOpsSpec extends SparkSpec {

  // P1 golden pairs — contract from the reference's formatter
  // (spark_dataframe_service.py:46-56), including its warts (leading
  // underscore on a leading capital, double underscore after a space).
  test("P1 formatColumnName golden pairs") {
    val golden = Seq(
      "user.id" -> "user_id",
      "User Name" -> "_user__name",
      "HTTPStatus" -> "_h_t_t_p_status",
      "weird$chars!" -> "weirdchars",
      "alreadysnake" -> "alreadysnake",
      "camelCase" -> "camel_case",
      "a b.c" -> "a_b_c",
      "" -> "")
    golden.foreach { case (in, want) =>
      assert(ColumnOps.formatColumnName(in) === want, s"for input '$in'")
    }
  }

  test("P1 formatColumnName is idempotent on its own output (property)") {
    assert(graft.Check.holds { (s: String) =>
      val once = ColumnOps.formatColumnName(s)
      ColumnOps.formatColumnName(once) == once
    })
  }

  test("P1 output contains only word characters, lowercased (property)") {
    assert(graft.Check.holds { (s: String) =>
      ColumnOps.formatColumnName(s).matches("[a-z0-9_]*")
    })
  }

  test("P2 formatColumnNames renames every column in one pass") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("User Id", "EventType")
    val out = df.formatColumnNames()
    assert(out.columns.toSeq === Seq("_user__id", "_event_type"))
    // exactly one Project added on top of the input plan, however wide
    def projects(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.analyzed.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
      }.size
    assert(projects(out) === projects(df) + 1)
  }

  test("P3 struct->JSON and P5 struct->string differ as documented") {
    import spark.implicits._
    val df = Seq((1, (2, "x"))).toDF("id", "s")
    val json = df.convertStructTypeToJson().select("s").as[String].head()
    val str = df.convertStructTypeToString().select("s").as[String].head()
    assert(json === """{"_1":2,"_2":"x"}""")
    assert(str === "{2, x}")
  }

  test("P4 array->JSON serializes array columns only") {
    import spark.implicits._
    val df = Seq((1, Seq(1, 2, 3))).toDF("id", "a")
    val out = df.convertArrayTypeToJson()
    assert(out.schema("a").dataType.typeName === "string")
    assert(out.schema("id").dataType.typeName === "integer")
    assert(out.select("a").as[String].head() === "[1,2,3]")
  }

  test("P6 createColumnsFromSeq keeps declared order and values") {
    import spark.implicits._
    val out = Seq(1).toDF("id")
      .createColumnsFromSeq(Seq("env" -> "prod", "v" -> 7))
    assert(out.columns.toSeq === Seq("id", "env", "v"))
    assert(out.select("env", "v").as[(String, Int)].head() === (("prod", 7)))
  }

  test("P7/P8 year month day derivation agrees between column and literal") {
    import spark.implicits._
    val df = Seq("2024-02-29").toDF("d").select(to_date(col("d")).as("d"))
    val fromCol = df.withYearMonthDayFromColumn("d")
      .select("year", "month", "day").as[(Int, Int, Int)].head()
    val fromLit = df.withYearMonthDayFromDate(LocalDate.of(2024, 2, 29))
      .select("year", "month", "day").as[(Int, Int, Int)].head()
    assert(fromCol === ((2024, 2, 29)))
    assert(fromLit === fromCol)
  }

  test("P6/P7 replace an existing column in place instead of duplicating") {
    import spark.implicits._
    val df = Seq((1, "old")).toDF("id", "env")
    val out = df.createColumnsFromSeq(Seq("env" -> "prod", "v" -> 7))
    assert(out.columns.toSeq === Seq("id", "env", "v")) // no duplicate env
    assert(out.select("env").as[String].head() === "prod")
    // year/month/day over a frame that already has a year column
    val dated = Seq(("2024-02-29", 1999)).toDF("d", "year")
      .select(to_date(col("d")).as("d"), col("year"))
      .withYearMonthDayFromColumn("d")
    assert(dated.columns.count(_ == "year") === 1)
    assert(dated.select("year").as[Int].head() === 2024) // replaced
  }

  test("flattenStructs: depth-first names, arrays untouched, values intact") {
    import spark.implicits._
    val df = Seq((1L, "n", 2.5, "s", Seq(1, 2)))
      .toDF("id", "name", "bal", "seg", "tags")
      .select(col("id"), struct(
        col("name"),
        struct(col("bal"), col("seg")).as("acct"),
        col("tags")).as("info"))
    val flat = df.flattenStructs()
    flat.columns.toSeq shouldBe
      Seq("id", "info_name", "info_acct_bal", "info_acct_seg", "info_tags")
    val r = flat.head()
    r.getLong(0) shouldBe 1L
    r.getString(1) shouldBe "n"
    r.getDouble(2) shouldBe 2.5
    r.getSeq[Int](4) shouldBe Seq(1, 2)
  }

  test("flattenStructs: collisions fail loudly, custom separator works") {
    import spark.implicits._
    val clash = Seq((1, (2, 3))).toDF("a_b", "a")
      .select(col("a_b"), struct(col("a._1").as("b")).as("a"))
    an[IllegalArgumentException] should be thrownBy clash.flattenStructs()
    // "." separator avoids that collision
    clash.flattenStructs(sep = ".").columns.toSeq shouldBe Seq("a_b", "a.b")
  }
}
