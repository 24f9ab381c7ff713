package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // three tight blobs on a line, ids interleaved (id % 3 = blob) so the
  // deterministic first-k-by-id init lands one seed per blob — the init is
  // a documented contract (reproducibility), not a quality heuristic
  private def blobs = (0 until 30).map { i =>
    val center = (i % 3) * 10.0f
    (i.toLong, Seq(center + (i / 3) * 0.01f, 1.0f))
  }.toDF("id", "vec")

  test("kmeans separates well-separated blobs exactly") {
    val m = Clustering.kmeans(blobs, "id", "vec", k = 3, iterations = 3)
    val cells = Clustering.assign(blobs, "vec", m)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    // all members of a blob share a cell; the three blobs get three cells
    (0 until 30).groupBy(_ % 3).values.foreach { ids =>
      ids.map(i => cells(i.toLong)).toSet should have size 1
    }
    cells.values.toSet should have size 3
  }

  test("iterations refine wcss monotonically on the blob fixture") {
    val wcss = (0 to 2).map { it =>
      val m = Clustering.kmeans(blobs, "id", "vec", k = 3, iterations = it)
      Clustering.summary(blobs, "vec", m)
        .agg(sum("wcss")).as[Double].collect().head
    }
    wcss(1) should be <= wcss(0)
    wcss(2) should be <= wcss(1)
  }

  test("deterministic: identical model across reruns") {
    val a = Clustering.kmeans(blobs, "id", "vec", k = 3, iterations = 2)
    val b = Clustering.kmeans(blobs, "id", "vec", k = 3, iterations = 2)
    a.centroids.map(_.toSeq) shouldBe b.centroids.map(_.toSeq)
  }

  test("empty cells keep their previous centroid") {
    // k=3 over two points: init picks the two real vectors plus... only 2
    // available -> require fails; instead: three identical points, k=2 —
    // the second init centroid equals the first, every point ties to cell
    // 0 (smaller id wins), cell 1 captures nothing and must survive
    val d = Seq((1L, Seq(5.0f, 5.0f)), (2L, Seq(5.0f, 5.0f)),
      (3L, Seq(5.0f, 5.0f))).toDF("id", "vec")
    val m = Clustering.kmeans(d, "id", "vec", k = 2, iterations = 2)
    m.centroids(1).toSeq shouldBe Seq(5.0f, 5.0f)
    Clustering.summary(d, "vec", m)
      .select("cell", "n").as[(Int, Long)].collect().toMap shouldBe Map(0 -> 3L)
  }

  test("model round-trips through the persistable DataFrame form") {
    val m = Clustering.kmeans(blobs, "id", "vec", k = 3, iterations = 1)
    val back = Clustering.Model.fromDF(m.toDF(spark))
    back.centroids.map(_.toSeq) shouldBe m.centroids.map(_.toSeq)
  }

  test("suggestNlist is the rounded sqrt-corpus rule, floored at 1") {
    // the y7 declaration and its DuckDB oracle both derive nlist from the
    // data with floor(sqrt(n)+0.5) — this pins the Scala side to the rule
    Clustering.suggestNlist(0) shouldBe 1
    Clustering.suggestNlist(1) shouldBe 1
    Clustering.suggestNlist(450) shouldBe 21 // sf0.01's 90% snapshot
    Clustering.suggestNlist(1800) shouldBe 42 // sf0.1's 90% snapshot
    Clustering.suggestNlist(2_000_000L) shouldBe 1414
  }

  test("roundDigits pins centroids to the rounded grid") {
    val m = Clustering.kmeans(blobs, "id", "vec", k = 3, iterations = 1,
      roundDigits = 2)
    m.centroids.flatten.foreach { c =>
      val scaled = c * 100.0
      math.abs(scaled - math.rint(scaled)) should be < 1e-3
    }
  }

  test("balancedSample thins big clusters toward the target and keeps small ones") {
    // blob 0 inflated to 200 members, blobs 1-2 stay at 10
    val big = (0 until 200).map(i => (1000L + i, Seq(0.0f + (i % 10) * 0.01f, 1.0f)))
    val d = (big ++ (10 until 30).map { i =>
      val center = (i / 10) * 10.0f
      (i.toLong, Seq(center + (i % 10) * 0.01f, 1.0f))
    }).toDF("id", "vec")
    val m = Clustering.kmeans(d, "id", "vec", k = 3, iterations = 2)
    val sampled = Clustering.balancedSample(d, "id", "vec", m,
      targetPerCluster = 50L, salt = "s")
    val bySize = Clustering.assign(sampled, "vec", m)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val full = Clustering.assign(d, "vec", m)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val bigCell = full.maxBy(_._2)._1
    // big cluster thinned to ~50 (binomial spread), small ones intact
    bySize(bigCell).toDouble shouldBe 50.0 +- 25.0
    full.filter(_._1 != bigCell).foreach { case (cell, n) =>
      bySize(cell) shouldBe n
    }
    // determinism: same salt, same rows
    Clustering.balancedSample(d, "id", "vec", m, 50L, "s")
      .select("id").as[Long].collect().sorted shouldBe
      sampled.select("id").as[Long].collect().sorted
  }

  test("diversify drops exactly the ceil(f*n) most prototypical per cluster") {
    // one tight blob around (0,1): members at increasing distance, ids
    // ordered so distance rank is known
    val d = (0 until 8).map(i => (i.toLong, Seq(i * 0.1f, 1.0f)))
      .toDF("id", "vec")
    val m = Clustering.Model(Seq(Array(0.0f, 1.0f)))
    val kept = Clustering.diversify(d, "id", "vec", m, dropFraction = 0.25)
      .select("id").as[Long].collect().sorted.toSeq
    // ceil(0.25*8)=2 closest to (0,1) drop: ids 0,1
    kept shouldBe (2L to 7L)
    // dropFraction 0 keeps everything
    Clustering.diversify(d, "id", "vec", m, dropFraction = 0.0)
      .count() shouldBe 8L
    // deterministic
    Clustering.diversify(d, "id", "vec", m, dropFraction = 0.25)
      .select("id").as[Long].collect().sorted.toSeq shouldBe kept
  }
}
