package graft.ops

import graft.SparkSpec
import graft.ops.ValidateOps._

class ValidateOpsSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some("a@x.io"), Some(10.0), Some("click")),    // all good
      (2L, None, Some(5.0), Some("view")),                // null required
      (3L, Some("b@x.io"), Some(-2.0), Some("click")),    // check fails
      (4L, Some("c@x.io"), None, Some("purchase")),       // null optional-check field
      (5L, Some("d@x.io"), Some(1.0), Some("hack")))      // not in enum
      .toDF("id", "email", "value", "event_type")
  }

  private val rules = Seq(
    FieldRule.requiredField("email"),
    FieldRule("value", required = false, check = Some(_ >= 0), message = "< 0"),
    FieldRule.oneOf("event_type", Seq("click", "view", "purchase")))

  test("V1 null/check matrix: required-null, check-fail, optional-null, enum") {
    import spark.implicits._
    val out = fixture.validateFields(rules)
      .select("id", ErrorsColumn)
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Nil)
    assert(out(2L) === Seq("email: required"))
    assert(out(3L) === Seq("value: < 0"))
    assert(out(4L) === Nil) // null + required=false + check => passes
    assert(out(5L).exists(_.startsWith("event_type: not in")))
  }

  test("V1 a row failing several rules carries all errors") {
    import spark.implicits._
    val bad = Seq((9L, null.asInstanceOf[String], Some(-1.0), Some("zap")))
      .toDF("id", "email", "value", "event_type")
    val errs = bad.validateFields(rules)
      .select(ErrorsColumn).as[Seq[String]].head()
    assert(errs.size === 3)
  }

  test("validRows / invalidRows partition the input") {
    val v = fixture.validateFields(rules)
    assert(v.validRows.count() + v.invalidRows.count() === fixture.count())
    assert(v.validRows.count() === 2)
  }

  test("V2 min-count monitor passes at threshold and throws under it") {
    fixture.assertMinCount(5) // exactly the row count: passes
    val e = intercept[IllegalArgumentException] { fixture.assertMinCount(6) }
    assert(e.getMessage.contains("threshold"))
  }

  test("V3 zero-errors monitor throws with the offending count") {
    val v = fixture.validateFields(rules)
    val e = intercept[IllegalArgumentException] { v.assertNoValidationErrors() }
    assert(e.getMessage.contains("3 rows"))
    v.validRows.assertNoValidationErrors() // clean subset passes
  }

  test("matching rule validates date-shaped strings (reference regex)") {
    import spark.implicits._
    val df = Seq(("2024-01-31"), ("01/31/2024")).toDF("d")
    val out = df.validateFields(Seq(
        FieldRule.matching("d", "^\\d{4}-\\d{2}-\\d{2}$")))
      .select("d", ErrorsColumn).as[(String, Seq[String])].collect().toMap
    assert(out("2024-01-31") === Nil)
    assert(out("01/31/2024").nonEmpty)
  }
}
