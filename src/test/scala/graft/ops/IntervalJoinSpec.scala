package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "s", "e")

  private def naive(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)]) =
    (for {
      (li, ls, le) <- l if ls < le
      (ri, rs, re) <- r if rs < re
      if ls < re && rs < le
    } yield (li, ri)).toSet

  test("matches the naive definition exactly, multiplicity 1, any bin size") {
    val rng = new scala.util.Random(17)
    val l = Seq.tabulate(200) { i =>
      val s = rng.nextInt(1000).toLong; (i.toLong, s, s + 1 + rng.nextInt(80))
    }
    val r = Seq.tabulate(200) { i =>
      val s = rng.nextInt(1000).toLong; (1000L + i, s, s + 1 + rng.nextInt(80))
    }
    val expected = naive(l, r)
    for (bin <- Seq(7L, 32L, 1000L)) {
      val rows = IntervalJoin.overlap(iv(l: _*), iv(r: _*), "s", "e", bin)
        .select("l_id", "r_id").as[(Long, Long)].collect()
      rows.length shouldBe rows.toSet.size // exactly-once emission
      rows.toSet shouldBe expected
    }
  }

  test("touching endpoints do not overlap (half-open); empties dropped") {
    val out = IntervalJoin.overlap(
      iv((1L, 0L, 10L), (2L, 5L, 5L)), // id=2 is empty -> dropped
      iv((3L, 10L, 20L), (4L, 9L, 11L)), "s", "e", 8L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    out shouldBe Set((1L, 4L)) // [0,10) meets [9,11) but not [10,20)
  }

  test("plan: equi-join on the bin, no cartesian product") {
    val plan = IntervalJoin.overlap(
      iv((1L, 0L, 10L)), iv((2L, 5L, 15L)), "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
