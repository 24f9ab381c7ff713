package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class CohortsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention triangle: cohort sizes at offset 0, returns at offsets") {
    // week length 7d; epoch week of 2024-01-01 is stable across engines
    val df = Seq(
      // u1: first week w, back in w+1 and w+3
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-22 10:00:00")),
      // u2: same cohort, only week w
      (2L, ts("2024-01-02 10:00:00")),
      // u3: next cohort, back one week later
      (3L, ts("2024-01-08 10:00:00")),
      (3L, ts("2024-01-15 10:00:00")))
      .toDF("u", "ts")
    val out = Cohorts.retention(df, "u", "ts")
      .orderBy("cohort_period", "period_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .toSeq
    val byCohort = Cohorts.retention(df, "u", "ts")
      .orderBy("cohort_period", "period_offset").collect()
      .groupBy(_.getLong(0)).view.mapValues(
        _.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
    byCohort.size shouldBe 2
    val Seq(c0, c1) = byCohort.keys.toSeq.sorted
    c1 shouldBe c0 + 1
    byCohort(c0) shouldBe Map(0L -> 2L, 1L -> 1L, 3L -> 1L)
    byCohort(c1) shouldBe Map(0L -> 1L, 1L -> 1L)
    out.length shouldBe 5
  }

  test("retention: multiple events in one period count the entity once") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")))
      .toDF("u", "ts")
    val out = Cohorts.retention(df, "u", "ts").collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 0L
    out.head.getLong(2) shouldBe 1L
  }

  test("retention: day-granularity periods") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")))
      .toDF("u", "ts")
    val out = Cohorts.retention(df, "u", "ts", periodSeconds = 86400L)
      .orderBy("period_offset").collect()
    out.map(_.getLong(1)) shouldBe Array(0L, 2L)
  }
}
