package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")
  private val next = Seq(
    (1L, "a", 10.0),          // unchanged — dropped
    (2L, "B", 20.0),          // s changed
    (3L, "c", 31.0),          // v changed
    (5L, "e", 50.0))          // added; 4 removed
    .toDF("k", "s", "v")

  test("snapshotDiff: added/removed/changed with per-column attribution") {
    val out = Diff.snapshotDiff(base, next, Seq("k")).orderBy("k").collect()
    out.map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2))) shouldBe
      Array(
        (2L, "changed", Seq("s")),
        (3L, "changed", Seq("v")),
        (4L, "removed", Seq()),
        (5L, "added", Seq()))
  }

  test("snapshotDiff: null-safe — null→value and value→null both count") {
    val b = Seq((1L, Option("x")), (2L, None: Option[String]),
      (3L, None: Option[String])).toDF("k", "s")
    val n = Seq((1L, None: Option[String]), (2L, Option("y")),
      (3L, None: Option[String])).toDF("k", "s")
    val out = Diff.snapshotDiff(b, n, Seq("k")).orderBy("k").collect()
    out.map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "changed"), (2L, "changed")) // 3: null==null, unchanged
  }

  test("snapshotDiff: multi-column change lists columns in declared order") {
    val out = Diff.snapshotDiff(
      Seq((1L, "a", 1.0)).toDF("k", "s", "v"),
      Seq((1L, "z", 9.0)).toDF("k", "s", "v"),
      Seq("k")).collect()
    out.head.getSeq[String](2) shouldBe Seq("s", "v")
  }

  test("snapshotDiff: explicit compareCols ignores other columns") {
    val out = Diff.snapshotDiff(base, next, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    // k=2 differs only in s, which is not compared → dropped
    out.map(_.getLong(0)) shouldBe Array(3L, 4L, 5L)
  }

  test("snapshotDiff: schema drift — only shared columns compared by default") {
    val n2 = next.withColumn("extra", lit(1))
    val out = Diff.snapshotDiff(base, n2, Seq("k"))
      .filter(col("change") === "changed").collect()
    out.flatMap(_.getSeq[String](2)).toSet shouldBe Set("s", "v")
  }

  test("snapshotDiff: plan is one full-outer join, no cartesian") {
    val plan = Diff.snapshotDiff(base, next, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(plan.contains("FullOuter"), plan)
  }
}
