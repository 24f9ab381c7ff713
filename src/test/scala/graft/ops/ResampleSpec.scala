package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // step = 600s (10 min); slots are epoch seconds
  private val step = 600L

  test("grid, last-per-slot, forward fill across gaps, n_events") {
    val ev = Seq(
      ("u1", t("2024-03-01 10:01:00"), 1L, 10.0),
      ("u1", t("2024-03-01 10:07:00"), 2L, 20.0), // same slot, later -> wins
      ("u1", t("2024-03-01 10:31:00"), 3L, 30.0), // slot +3; +1,+2 are gaps
      ("u2", t("2024-03-01 10:15:00"), 4L, 99.0))
      .toDF("u", "ts", "eid", "v")
    val out = Resample.resampleLastFill(ev, "u", "ts", "v", "eid", step)
      .orderBy("u", "slot").collect()
    val u1 = out.filter(_.getString(0) == "u1")
    u1.length shouldBe 4 // 10:00, 10:10, 10:20, 10:30
    u1.map(_.getDouble(2)) shouldBe Array(20.0, 20.0, 20.0, 30.0)
    u1.map(_.getLong(3)) shouldBe Array(2L, 0L, 0L, 1L)
    val u2 = out.filter(_.getString(0) == "u2")
    u2.length shouldBe 1
    u2.head.getDouble(2) shouldBe 99.0
  }

  test("tie on timestamp breaks by tie column (larger id wins)") {
    val ev = Seq(
      ("u", t("2024-03-01 10:01:00"), 5L, 50.0),
      ("u", t("2024-03-01 10:01:00"), 9L, 90.0),
      ("u", t("2024-03-01 10:01:00"), 7L, 70.0))
      .toDF("u", "ts", "eid", "v")
    Resample.resampleLastFill(ev, "u", "ts", "v", "eid", step)
      .head().getDouble(2) shouldBe 90.0
  }

  test("null values neither fill nor count; leading nulls stay null") {
    val ev = Seq(
      ("u", t("2024-03-01 10:01:00"), 1L, Option.empty[Double]),
      ("u", t("2024-03-01 10:11:00"), 2L, Option(5.0)))
      .toDF("u", "ts", "eid", "v")
    val out = Resample.resampleLastFill(ev, "u", "ts", "v", "eid", step)
      .orderBy("slot").collect()
    // the null-valued event is ignored entirely: spine starts at 10:10
    out.length shouldBe 1
    out.head.getDouble(2) shouldBe 5.0
    out.head.getLong(3) shouldBe 1L
  }

  test("oversized key span fails loudly instead of exploding the spine") {
    val ev = Seq(
      ("u", t("2024-01-01 00:00:00"), 1L, 1.0),
      ("u", t("2024-12-31 00:00:00"), 2L, 2.0))
      .toDF("u", "ts", "eid", "v")
    val e = intercept[Exception] {
      Resample.resampleLastFill(ev, "u", "ts", "v", "eid", step,
        maxSlotsPerKey = 1000).collect()
    }
    assert(e.getMessage.contains("spans more than 1000 slots") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("spans more than 1000 slots"),
      e.getMessage)
  }

  test("plan partitions by key: no single-task global window") {
    val ev = Seq(("u", t("2024-03-01 10:01:00"), 1L, 1.0))
      .toDF("u", "ts", "eid", "v")
    val plan = Resample.resampleLastFill(ev, "u", "ts", "v", "eid", step)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("hashpartitioning(u"), plan)
  }
}
