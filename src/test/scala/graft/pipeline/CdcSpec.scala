package graft.pipeline

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alice", 100.0),
    (2L, "bob", 200.0),
    (3L, "carol", 300.0)
  ).toDF("id", "name", "bal")

  test("applyChanges: upsert, delete, insert, latest-wins") {
    val changes = Seq(
      (1L, 1L, "U", "alice", 110.0), // superseded by seq 2
      (1L, 2L, "U", "alice", 120.0),
      (2L, 1L, "D", "bob", 200.0), // delete
      (4L, 1L, "I", "dave", 400.0) // new key
    ).toDF("id", "seq", "op", "name", "bal")
    val out = Cdc.applyChanges(base, changes, Seq("id"), "seq", "op")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    out shouldBe Seq(
      (1L, "alice", 120.0),
      (3L, "carol", 300.0), // untouched
      (4L, "dave", 400.0))
  }

  test("a delete then a later re-insert of the same key survives") {
    val changes = Seq(
      (2L, 1L, "D", "bob", 0.0),
      (2L, 2L, "I", "bob2", 250.0)
    ).toDF("id", "seq", "op", "name", "bal")
    val out = Cdc.applyChanges(base, changes, Seq("id"), "seq", "op")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    out shouldBe Seq(
      (1L, "alice", 100.0), (2L, "bob2", 250.0), (3L, "carol", 300.0))
  }

  test("applying an already-applied batch is a no-op (idempotence)") {
    val changes = Seq(
      (1L, 2L, "U", "alice", 120.0),
      (2L, 1L, "D", "bob", 200.0)
    ).toDF("id", "seq", "op", "name", "bal")
    val once = Cdc.applyChanges(base, changes, Seq("id"), "seq", "op")
    val twice = Cdc.applyChanges(once, changes, Seq("id"), "seq", "op")
    twice.orderBy("id").as[(Long, String, Double)].collect().toSeq shouldBe
      once.orderBy("id").as[(Long, String, Double)].collect().toSeq
  }

  test("equal-seq ties resolve delete-wins (redundant feed replay)") {
    // a redundant feed replays the update alongside the delete that
    // superseded it, with the SAME sequence number — the key must stay
    // deleted, not resurrect because 'U' sorts above 'D'
    val changes = Seq(
      (2L, 5L, "U", "bob", 999.0),
      (2L, 5L, "D", "bob", 200.0)
    ).toDF("id", "seq", "op", "name", "bal")
    val out = Cdc.applyChanges(base, changes, Seq("id"), "seq", "op")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    out shouldBe Seq((1L, "alice", 100.0), (3L, "carol", 300.0))
  }

  test("latest-change reduction is an aggregate, not a window sort") {
    val changes = Seq((1L, 1L, "U", "a", 1.0))
      .toDF("id", "seq", "op", "name", "bal")
    val plan = Cdc.applyChanges(base, changes, Seq("id"), "seq", "op")
      .queryExecution.optimizedPlan.toString()
    plan should not include "Window"
    plan should include("Aggregate")
  }
}
