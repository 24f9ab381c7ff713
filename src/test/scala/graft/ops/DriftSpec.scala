package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(vs: Seq[Double]) = vs.map(Tuple1(_)).toDF("v")

  test("psi: identical distributions score ~0 in every bucket") {
    val ref = df((1 to 1000).map(_.toDouble))
    val out = Drift.psi(ref, ref, "v", buckets = 4, exact = true)
      .orderBy("bucket").collect()
    out.length shouldBe 4
    out.foreach { r =>
      r.getLong(1) shouldBe r.getLong(2)
      r.getDouble(5) shouldBe 0.0 +- 1e-9
    }
  }

  test("psi: shifted distribution drifts, sum flags it") {
    val ref = df((1 to 1000).map(_.toDouble))
    val cur = df((1 to 1000).map(_.toDouble + 500))
    val rows = Drift.psi(ref, cur, "v", buckets = 4, exact = true).collect()
    val total = rows.map(_.getDouble(5)).sum
    total should be > 0.25 // "major drift" threshold
    rows.foreach(_.getDouble(5) should be >= 0.0)
  }

  test("psi: empty bucket on one side stays finite via eps floor") {
    val ref = df((1 to 100).map(_.toDouble))
    val cur = df(Seq.fill(100)(1.0)) // all mass in bucket 0
    val rows = Drift.psi(ref, cur, "v", buckets = 4, exact = true)
      .orderBy("bucket").collect()
    rows.length shouldBe 4
    rows.foreach { r =>
      assert(!r.getDouble(5).isInfinite && !r.getDouble(5).isNaN)
    }
    // empty cur buckets report cur_n = 0 and the eps share
    rows.filter(_.getLong(2) == 0L).foreach(_.getDouble(4) shouldBe 1e-6)
  }

  test("psi: boundaries come from ref — cur outliers land in edge buckets") {
    val ref = df((1 to 100).map(_.toDouble))
    val cur = df(Seq(-1e9, 1e9))
    val rows = Drift.psi(ref, cur, "v", buckets = 4, exact = true)
      .filter(col("cur_n") > 0).orderBy("bucket").collect()
    rows.map(_.getInt(0)) shouldBe Array(0, 3)
  }

  test("ks: identical distributions gap 0, CDFs end at 1") {
    val ref = df((1 to 1000).map(_.toDouble))
    val rows = Drift.ks(ref, ref, "v", buckets = 4, exact = true)
      .orderBy("bucket").collect()
    rows.length shouldBe 4
    rows.foreach { r =>
      r.getDouble(3) shouldBe r.getDouble(4)
      r.getDouble(5) shouldBe 0.0
      r.getDouble(6) shouldBe 0.0
    }
    rows.last.getDouble(3) shouldBe 1.0
  }

  test("ks: a location shift shows up as the worst CDF gap") {
    val ref = df((1 to 1000).map(_.toDouble))
    val cur = df((1 to 1000).map(_.toDouble + 500))
    val rows = Drift.ks(ref, cur, "v", buckets = 4, exact = true).collect()
    val ks = rows.head.getDouble(6)
    ks should be >= 0.4
    rows.foreach(_.getDouble(6) shouldBe ks) // repeated per row
    // the max gap is attained by some bucket's cdf_gap
    rows.map(_.getDouble(5)).max shouldBe ks
  }

  test("chiSquare: perfectly balanced table scores 0, dof correct") {
    import spark.implicits._
    val data = (for (a <- Seq("x", "y"); b <- Seq("p", "q", "r");
      _ <- 1 to 10) yield (a, b)).toDF("a", "b")
    val out = Drift.chiSquare(data, "a", "b").collect()
    out.length shouldBe 6
    out.foreach { r =>
      r.getDouble(4) shouldBe 0.0 // contrib
      r.getDouble(5) shouldBe 0.0 // chi2
      r.getLong(6) shouldBe 2L    // dof = (2-1)(3-1)
      r.getLong(7) shouldBe 60L
    }
  }

  test("chiSquare: a diagonal association alarms; structural zeros kept") {
    import spark.implicits._
    val data = (Seq.fill(30)(("x", "p")) ++ Seq.fill(30)(("y", "q")))
      .toDF("a", "b")
    val out = Drift.chiSquare(data, "a", "b").collect()
    out.length shouldBe 4 // full 2x2 grid including two zero cells
    val zeros = out.filter(_.getLong(2) == 0L)
    zeros.length shouldBe 2
    zeros.foreach(_.getDouble(3) shouldBe 15.0) // expected stays positive
    // perfect association on a 2x2 with n=60: chi2 = n = 60
    out.head.getDouble(5) shouldBe 60.0 +- 1e-3
  }

  test("chiSquare: over the grid-cells cap fails loudly at runtime") {
    import spark.implicits._
    // 20 x 20 = 400 grid cells against a cap of 100: the gate must raise
    // BEFORE the quadratic grid materializes, naming the cap it tripped
    val data = (for (a <- 1 to 20; b <- 1 to 20) yield (s"a$a", s"b$b"))
      .toDF("a", "b")
    val e = intercept[Exception] {
      Drift.chiSquare(data, "a", "b", maxGridCells = 100).collect()
    }
    e.getMessage should include("maxGridCells=100")
    // same shape under the default cap: runs fine
    Drift.chiSquare(data, "a", "b").count() shouldBe 400L
  }

  test("psi: data never shuffles by value — aggs then O(buckets) join") {
    val ref = df((1 to 100).map(_.toDouble))
    val plan = Drift.psi(ref, ref, "v", buckets = 4, exact = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") || plan.contains("BroadcastNestedLoop"),
      plan) // the totals crossJoin is a 1-row broadcast, never cartesian
    assert(!plan.contains("SortMergeJoin") || plan.contains("FullOuter"), plan)
  }
}
