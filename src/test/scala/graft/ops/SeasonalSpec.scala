package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  // y = 10 + 0.5*t (trend) + planted period-4 pattern (+2, 0, -1, -1)
  private val pattern = Seq(2.0, 0.0, -1.0, -1.0)
  private def series = (0 until 40).map(t =>
    ("k", t.toLong, 10.0 + 0.5 * t + pattern(t % 4))).toDF("k", "idx", "y")

  test("recovers a linear trend and the planted seasonal pattern (even period)") {
    val out = Seasonal.decompose(series, "k", "idx", "y", period = 4)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    // interior rows: trend is the true line, seasonal the planted shape
    // (pattern mean is 0 so no re-centering shift), residual ~ 0
    for (t <- 2L to 37L) {
      val (tr, se, re) = out(t)
      tr.get shouldBe (10.0 + 0.5 * t) +- 1e-9
      se.get shouldBe pattern((t % 4).toInt) +- 1e-9
      re.get shouldBe 0.0 +- 1e-9
    }
    // edge rows: incomplete centered window -> null trend and residual,
    // seasonal still known from the phase mean
    val (tr0, se0, re0) = out(0L)
    tr0 shouldBe None
    re0 shouldBe None
    se0.get shouldBe pattern(0) +- 1e-9
  }

  test("odd period uses the plain centered average") {
    val d = (0 until 21).map(t => ("k", t.toLong, t.toDouble)).toDF("k", "idx", "y")
    val out = Seasonal.decompose(d, "k", "idx", "y", period = 3)
      .filter(col("trend").isNotNull)
      .select("idx", "trend").as[(Long, Double)].collect().toMap
    out.keySet shouldBe (1L to 19L).toSet
    out.foreach { case (t, tr) => tr shouldBe t.toDouble +- 1e-9 }
  }

  test("seasonal components sum to ~zero over one period") {
    val out = Seasonal.decompose(series, "k", "idx", "y", period = 4)
      .filter(col("idx") < 4)
      .agg(sum("seasonal")).as[Double].collect().head
    out shouldBe 0.0 +- 1e-9
  }

  test("anomalies flags the planted spike and only the spike") {
    // clean seasonal series + one +25 spike at t=17: every other interior
    // residual is ~0, so the spike dominates the stddev and is the only
    // |z| above threshold; edge rows (null residual) carry null z / false
    val spiked = (0 until 40).map { t =>
      val extra = if (t == 17) 25.0 else 0.0
      ("k", t.toLong, 10.0 + 0.5 * t + pattern(t % 4) + extra)
    }.toDF("k", "idx", "y")
    val out = Seasonal.anomalies(spiked, "k", "idx", "y", period = 4,
      zThreshold = 3.0)
      .select("idx", "z", "is_anomaly")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2)))
      .toMap
    out(17L)._2 shouldBe true
    out(17L)._1.get should be > 3.0
    out(0L)._1 shouldBe None      // incomplete window: null residual
    out(0L)._2 shouldBe false
    // no other interior row may fire
    (2L to 37L).filter(_ != 17L).foreach { t =>
      withClue(s"idx $t") {
        // the spike leaks into neighbors THROUGH the moving average and
        // phase means, but never past the threshold
        out(t)._2 shouldBe false
      }
    }
  }

  test("keys decompose independently") {
    val two = series.unionByName(
      (0 until 40).map(t => ("j", t.toLong, 100.0 - t))
        .toDF("k", "idx", "y"))
    val out = Seasonal.decompose(two, "k", "idx", "y", period = 4)
      .filter(col("k") === "j" && col("trend").isNotNull)
      .select("idx", "trend", "seasonal").as[(Long, Double, Double)].collect()
    out.foreach { case (t, tr, se) =>
      tr shouldBe (100.0 - t) +- 1e-9
      se shouldBe 0.0 +- 1e-9
    }
  }
}
