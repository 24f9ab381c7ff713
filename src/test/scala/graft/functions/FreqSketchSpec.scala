package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def summaryOf(items: Seq[String], capacity: Int): Seq[(String, Long, Long)] =
    items.toDF("item").repartition(4)
      .agg(FreqFunctions.heavyHitters(col("item"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.est", "e.err")
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime: capacity above ndv gives exact counts, zero error") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val got = summaryOf(scala.util.Random.shuffle(items), capacity = 16)
    got shouldBe Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 20L, 0L))
  }

  test("deterministic order on count ties: item ascending") {
    val got = summaryOf(Seq("z", "y", "z", "y"), capacity = 8)
    got shouldBe Seq(("y", 2L, 0L), ("z", 2L, 0L))
  }

  test("MG bounds hold under eviction and merge: est <= true <= est + err") {
    val rnd = new scala.util.Random(7)
    // skewed stream: a few heavy keys over a long tail
    val items = (1 to 20000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 30) "hot1" else if (r < 50) "hot2" else s"tail${rnd.nextInt(500)}"
    }
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = summaryOf(items, capacity = 16)
    val err = got.head._3
    got.foreach { case (item, est, e) =>
      e shouldBe err // one bound for the whole summary
      est should be <= truth(item)
      truth(item) should be <= (est + err)
    }
    // any item with true frequency > n/(capacity+1) must be present;
    // merge trims add error, so the usable bound is the REPORTED err
    val present = got.map(_._1).toSet
    truth.foreach { case (item, cnt) =>
      if (cnt > err) present should contain(item)
    }
    present should contain allOf ("hot1", "hot2")
  }

  test("null items are skipped") {
    val got = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(FreqFunctions.heavyHitters(col("item"), 4).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toSeq
    got shouldBe Seq(("a", 2L))
  }

  test("SQL surface: graft_heavy_hitters registered and grouped") {
    graft.GraftExtensions.install(spark)
    Seq((1, "x"), (1, "x"), (1, "y"), (2, "z")).toDF("g", "item")
      .createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      """SELECT g, graft_heavy_hitters(item, 8) AS hh FROM hh_in
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    rows.length shouldBe 2
    val g1 = rows(0).getSeq[Row](1).map(r => (r.getString(0), r.getLong(1)))
    g1 shouldBe Seq(("x", 2L), ("y", 1L))
  }

  test("capacity bounds are enforced") {
    an[IllegalArgumentException] should be thrownBy
      HeavyHitters(org.apache.spark.sql.GraftShim.expression(col("x")), 0)
  }
}
