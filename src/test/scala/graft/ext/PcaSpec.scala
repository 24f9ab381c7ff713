package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 2-D data stretched along (1, 1): dominant component must align with it
  private def stretched = (0 until 200).map { i =>
    val t = (i - 100) / 10.0f
    val noise = ((i * 37) % 11 - 5) / 50.0f
    (i.toLong, Seq(t + noise, t - noise))
  }.toDF("id", "vec")

  test("moments: mean and covariance match the closed form") {
    val d = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 2.0f)), (4L, Seq(0.0f, -2.0f))).toDF("id", "vec")
    val (n, mean, cov) = Pca.moments(d, "vec")
    n shouldBe 4L
    mean.toSeq shouldBe Seq(0.0, 0.0)
    cov(0) shouldBe 0.5 +- 1e-12   // var x = (1+1)/4
    cov(3) shouldBe 2.0 +- 1e-12   // var y = (4+4)/4
    cov(1) shouldBe 0.0 +- 1e-12
  }

  test("moments: ragged vector lengths fail deterministically at update") {
    // one partition so BOTH lengths hit the same update buffer — the
    // failure must come from update's length check, not merge's
    val d = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("id", "vec").coalesce(1)
    val e = intercept[Exception] { Pca.moments(d, "vec") }
    e.getMessage should include("mixed vector lengths")
  }

  test("dominant component aligns with the stretched axis") {
    val m = Pca.fit(stretched, "vec", k = 2)
    val c0 = m.components.head
    math.abs(c0(0)) shouldBe math.abs(c0(1)) +- 0.05
    c0(0) * c0(1) should be > 0.0            // same sign = the (1,1) axis
    m.eigenvalues.head should be > m.eigenvalues(1) * 100
    m.explainedVariance should be > 0.99
  }

  test("components are orthonormal") {
    val m = Pca.fit(stretched, "vec", k = 2)
    val a = m.components.head
    val b = m.components(1)
    a.map(x => x * x).sum shouldBe 1.0 +- 1e-9
    b.map(x => x * x).sum shouldBe 1.0 +- 1e-9
    a.zip(b).map { case (x, y) => x * y }.sum shouldBe 0.0 +- 1e-9
  }

  test("whitened projection has identity covariance") {
    val m = Pca.fit(stretched, "vec", k = 2)
    val proj = Pca.transform(stretched, "vec", m, whiten = true)
      .select(col("projection").cast("array<float>").as("vec"))
    val (_, mean, cov) = Pca.moments(proj, "vec")
    mean(0) shouldBe 0.0 +- 1e-4
    mean(1) shouldBe 0.0 +- 1e-4
    cov(0) shouldBe 1.0 +- 1e-3
    cov(3) shouldBe 1.0 +- 1e-3
    cov(1) shouldBe 0.0 +- 1e-3
  }

  test("projection matches the driver-side matrix math") {
    val m = Pca.fit(stretched, "vec", k = 2)
    val row = stretched.filter(col("id") === 7L)
    val x = row.select("vec").as[Seq[Float]].collect().head
    val expected = m.components.map(c =>
      c.zipWithIndex.map { case (w, i) => w * (x(i) - m.mean(i)) }.sum)
    val got = Pca.transform(row, "vec", m)
      .select("projection").as[Seq[Double]].collect().head
    got.zip(expected).foreach { case (g, e) => g shouldBe e +- 1e-9 }
  }

  test("model round-trips through its DataFrame form") {
    val m = Pca.fit(stretched, "vec", k = 2)
    val back = Pca.Model.fromDF(m.toDF(spark))
    back.mean shouldBe m.mean
    back.components shouldBe m.components
    back.eigenvalues shouldBe m.eigenvalues
    back.totalVariance shouldBe m.totalVariance
  }

  test("covarianceDF long format agrees with the moments matrix") {
    val (_, _, cov) = Pca.moments(stretched, "vec")
    val long = Pca.covarianceDF(stretched, "vec")
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    long((0, 0)) shouldBe cov(0)
    long((0, 1)) shouldBe cov(1)
    long((1, 0)) shouldBe cov(2)
    long((1, 1)) shouldBe cov(3)
  }

  test("transform is shuffle-free") {
    val m = Pca.fit(stretched, "vec", k = 1)
    Pca.transform(stretched, "vec", m)
      .queryExecution.executedPlan.toString should not include "Exchange"
  }
}
