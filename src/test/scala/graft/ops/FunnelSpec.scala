package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def us(s: String): Long = ts(s).getTime * 1000L

  private val Day = 86400000000L // micros

  private def ev(rows: (Long, String, String)*): DataFrame =
    rows.map { case (u, t, tp) => (u, ts(t), tp) }.toDF("user", "ts", "tpe")

  private def run(df: DataFrame, stages: Seq[String] = Seq("a", "b", "c"),
      window: Long = 7 * Day) =
    Funnel.funnel(df, "user", "ts", "tpe", stages, window)
      .as[(Long, Int, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq

  test("full conversion inside the window") {
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-02 00:00:00", "b"),
      (1L, "2024-01-03 00:00:00", "c")))
    out shouldBe Seq((1L, 3, Some(us("2024-01-01 00:00:00")),
      Some(us("2024-01-02 00:00:00")), Some(us("2024-01-03 00:00:00")), true))
  }

  test("chain is earliest-after-previous, not any-order") {
    // b before the first a must not count; the b AFTER a does
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "b"),
      (1L, "2024-01-02 00:00:00", "a"),
      (1L, "2024-01-05 00:00:00", "b")))
    out shouldBe Seq((1L, 2, Some(us("2024-01-02 00:00:00")),
      Some(us("2024-01-05 00:00:00")), None, false))
  }

  test("stage advance requires strictly increasing time") {
    // b at exactly a's timestamp does not advance
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-01 00:00:00", "b")))
    out.head._2 shouldBe 1
  }

  test("completion outside the window is not completed") {
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-02 00:00:00", "b"),
      (1L, "2024-01-20 00:00:00", "c")))
    out.head._2 shouldBe 3
    out.head._6 shouldBe false
  }

  test("chain takes the minimum qualifying event per stage") {
    // two bs after a: the earlier one is the chain's ts_2
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-04 00:00:00", "b"),
      (1L, "2024-01-02 00:00:00", "b")))
    out.head._4 shouldBe Some(us("2024-01-02 00:00:00"))
  }

  test("non-funnel event types are ignored; users without any funnel event absent") {
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-02 00:00:00", "zzz"),
      (2L, "2024-01-01 00:00:00", "zzz")))
    out.map(_._1) shouldBe Seq(1L)
    out.head._2 shouldBe 1
  }

  test("users advance independently") {
    val out = run(ev(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-02 00:00:00", "b")))
    out.map(o => (o._1, o._2)) shouldBe Seq((1L, 1), (2L, 2))
  }

  test("stage count bounds are enforced") {
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnel(ev(), "user", "ts", "tpe", Seq("a"), Day)
  }

  test("transitions: consecutive pairs per entity, shares sum to 1") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "a"),
      (2L, ts("2024-01-01 00:00:01"), 4L, "a"),
      (2L, ts("2024-01-01 00:00:02"), 5L, "c"),
      (3L, ts("2024-01-01 00:00:01"), 6L, "z")) // lone event: no pair
      .toDF("u", "ts", "eid", "tpe")
    val out = Funnel.transitions(df, "u", "ts", "eid", "tpe")
      .orderBy("from_state", "to_state").collect()
    out.map(r => (r.getString(0), r.getString(1), r.getLong(2))) shouldBe
      Array(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L))
    // from 'a': two transitions, each share 0.5; from 'b': one, share 1
    out.filter(_.getString(0) == "a").map(_.getDouble(3)).sum shouldBe 1.0
    out.filter(_.getString(0) == "b").head.getDouble(3) shouldBe 1.0
    // cross-entity boundaries never pair: no (a -> a) from u1's tail to
    // u2's head, no transition out of u3
    assert(!out.exists(r => r.getString(0) == "z"))
  }

  test("transitions: tie on timestamp ordered by the tie column") {
    val t0 = ts("2024-01-01 00:00:01")
    val df = Seq((1L, t0, 2L, "b"), (1L, t0, 1L, "a"), (1L, t0, 3L, "c"))
      .toDF("u", "ts", "eid", "tpe")
    Funnel.transitions(df, "u", "ts", "eid", "tpe")
      .orderBy("from_state").collect()
      .map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("a", "b"), ("b", "c"))
  }
}
