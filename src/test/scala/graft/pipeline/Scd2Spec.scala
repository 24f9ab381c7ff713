package graft.pipeline

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d = Date.valueOf(_: String)

  // current: k1 open + an older closed version; k2 open; k3 open
  private def current = Seq(
    (1L, "alice", 100.0, d("1990-01-01"), Option(d("1995-01-01")), false),
    (1L, "alice", 150.0, d("1995-01-01"), Option.empty[Date], true),
    (2L, "bob", 200.0, d("1995-01-01"), Option.empty[Date], true),
    (3L, "carol", 300.0, d("1995-01-01"), Option.empty[Date], true)
  ).toDF("id", "name", "bal", "valid_from", "valid_to", "is_current")

  // updates: k1 changed, k2 unchanged, k4 new; k3 missing
  private def updates = Seq(
    (1L, "alice", 175.0),
    (2L, "bob", 200.0),
    (4L, "dave", 400.0)
  ).toDF("id", "name", "bal")

  private def run(closeMissing: Boolean) =
    Scd2.merge(current, updates, Seq("id"), lit("2000-01-01"),
        closeMissing = closeMissing)
      .orderBy("id", "valid_from")
      .as[(Long, String, Double, Date, Option[Date], Boolean)]
      .collect().toSeq

  test("merge closes changed rows, inserts new versions, keeps history") {
    run(closeMissing = false) shouldBe Seq(
      (1L, "alice", 100.0, d("1990-01-01"), Some(d("1995-01-01")), false),
      (1L, "alice", 150.0, d("1995-01-01"), Some(d("2000-01-01")), false),
      (1L, "alice", 175.0, d("2000-01-01"), None, true),
      (2L, "bob", 200.0, d("1995-01-01"), None, true), // unchanged: untouched
      (3L, "carol", 300.0, d("1995-01-01"), None, true), // missing: kept open
      (4L, "dave", 400.0, d("2000-01-01"), None, true) // new key
    )
  }

  test("closeMissing treats the batch as a full snapshot") {
    val rows = run(closeMissing = true)
    rows.filter(_._1 == 3L) shouldBe Seq(
      (3L, "carol", 300.0, d("1995-01-01"), Some(d("2000-01-01")), false))
    // everything else is identical to the incremental merge
    rows.filterNot(_._1 == 3L) shouldBe
      run(closeMissing = false).filterNot(_._1 == 3L)
  }

  test("re-delivering the same batch is a no-op (idempotence)") {
    val once = Scd2.merge(current, updates, Seq("id"), lit("2000-01-01"))
    val twice = Scd2.merge(once, updates, Seq("id"), lit("2000-01-01"))
      .orderBy("id", "valid_from")
      .as[(Long, String, Double, Date, Option[Date], Boolean)]
      .collect().toSeq
    twice shouldBe run(closeMissing = false)
  }

  test("null-safe change detection: null -> value opens a new version") {
    val cur = Seq((1L, Option.empty[String], d("1995-01-01"),
      Option.empty[Date], true)).toDF("id", "tag", "valid_from", "valid_to",
      "is_current")
    val upd = Seq((1L, Option("x"))).toDF("id", "tag")
    val out = Scd2.merge(cur, upd, Seq("id"), lit("2000-01-01"))
      .orderBy("valid_from")
      .as[(Long, Option[String], Date, Option[Date], Boolean)]
      .collect().toSeq
    out shouldBe Seq(
      (1L, None, d("1995-01-01"), Some(d("2000-01-01")), false),
      (1L, Some("x"), d("2000-01-01"), None, true))
  }

  test("closed history stays out of the join (single shuffle on open slice)") {
    val plan = Scd2.merge(current, updates, Seq("id"), lit("2000-01-01"))
      .queryExecution.optimizedPlan.toString()
    // exactly one join in the whole merge
    "(?i)join".r.findAllIn(plan).size shouldBe 1
  }

  test("broadcastUpdates mode: identical result, broadcast body join") {
    val out = Scd2.merge(current, updates, Seq("id"), lit("2000-01-01"),
        broadcastUpdates = true)
      .orderBy("id", "valid_from")
      .as[(Long, String, Double, Date, Option[Date], Boolean)]
      .collect().toSeq
    out shouldBe run(closeMissing = false)

    val closeAll = Scd2.merge(current, updates, Seq("id"), lit("2000-01-01"),
        closeMissing = true, broadcastUpdates = true)
      .orderBy("id", "valid_from")
      .as[(Long, String, Double, Date, Option[Date], Boolean)]
      .collect().toSeq
    closeAll shouldBe run(closeMissing = true)

    // the open slice meets the batch in a broadcast join, so the
    // dimension's full width never shuffles
    val physical = Scd2.merge(current, updates, Seq("id"),
        lit("2000-01-01"), broadcastUpdates = true)
      .queryExecution.executedPlan.toString()
    physical should include("BroadcastHashJoin")
  }

  test("asOfView returns the version active at a point in time") {
    val merged = Scd2.merge(current, updates, Seq("id"), lit("2000-01-01"))
    // between the k1 versions: the 1995 version is the active one
    Scd2.asOfView(merged, lit("1997-06-01"))
      .filter($"id" === 1L).select("bal").as[Double].collect().toSeq shouldBe
      Seq(150.0)
    // after the merge: the new version
    Scd2.asOfView(merged, lit("2001-01-01"))
      .filter($"id" === 1L).select("bal").as[Double].collect().toSeq shouldBe
      Seq(175.0)
    // before any version existed: nothing
    Scd2.asOfView(merged, lit("1980-01-01"))
      .filter($"id" === 1L).count() shouldBe 0L
  }
}
