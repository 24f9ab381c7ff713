package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize: tails clip to the group quantiles, middle passes exact") {
    // group g: 1..99 plus a 1e6 spike
    val data = ((1 to 99).map(v => ("g", v.toDouble)) :+ ("g", 1e6))
      .toDF("k", "v")
    val out = Normalize.winsorize(data, Seq("k"), "v",
      lo = 0.05, hi = 0.95, exact = true).collect()
    val pLo = out.head.getDouble(2)
    val pHi = out.head.getDouble(3)
    pLo should be < 10.0
    pHi should be < 110.0 // the spike cannot drag p95 anywhere near 1e6
    out.foreach { r =>
      val (v, w) = (r.getDouble(1), r.getDouble(4))
      if (v < pLo) w shouldBe pLo
      else if (v > pHi) w shouldBe pHi
      else w shouldBe v // untouched rows are bit-exact
    }
    out.map(_.getDouble(4)).max shouldBe pHi
  }

  test("winsorize: groups clip independently") {
    val data = ((1 to 50).map(v => ("a", v.toDouble)) ++
      (1 to 50).map(v => ("b", v * 1000.0))).toDF("k", "v")
    val out = Normalize.winsorize(data, Seq("k"), "v",
      lo = 0.1, hi = 0.9, exact = true)
      .groupBy("k").agg(max("value_w")).orderBy("k").collect()
    out(0).getDouble(1) should be < 50.0
    out(1).getDouble(1) should be > 40000.0
  }

  test("winsorize: broadcast bounds, data never shuffles") {
    val data = (1 to 100).map(v => ("g", v.toDouble)).toDF("k", "v")
    val plan = Normalize.winsorize(data, Seq("k"), "v", exact = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
