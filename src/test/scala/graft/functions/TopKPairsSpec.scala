package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPairsSpec extends SparkSpec {

  test("heap keeps the k best with ties to the smaller id, best first") {
    val h = new TopKHeap(3)
    Seq((0.5, 10L), (0.9, 7L), (0.9, 3L), (0.1, 1L), (0.7, 2L), (0.9, 9L))
      .foreach { case (s, i) => h.offer(s, i) }
    val got = h.sortedIndices.map(i => (h.scores(i), h.ids(i))).toSeq
    assert(got === Seq((0.9, 3L), (0.9, 7L), (0.9, 9L)))
  }

  test("heap agrees with sort-then-take on seeded random streams") {
    val rng = new scala.util.Random(graft.Check.PinnedSeed)
    (1 to 50).foreach { _ =>
      val k = 1 + rng.nextInt(8)
      val n = rng.nextInt(200)
      // coarse scores force plenty of ties
      val entries = Seq.fill(n)((rng.nextInt(10) / 10.0, rng.nextLong()))
      val h = new TopKHeap(k)
      entries.foreach { case (s, i) => h.offer(s, i) }
      val got = h.sortedIndices.map(i => (h.scores(i), h.ids(i))).toSeq
      // the heap keeps exact duplicates just like the sort does
      val expected = entries.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got === expected, s"k=$k n=$n")
    }
  }

  test("merge across partial buffers equals a single-buffer run") {
    val rng = new scala.util.Random(graft.Check.PinnedSeed ^ 0x5f5f5f5fL)
    val entries = Seq.fill(500)((rng.nextDouble(), rng.nextLong()))
    val whole = new TopKHeap(7)
    entries.foreach { case (s, i) => whole.offer(s, i) }
    val parts = entries.grouped(97).map { chunk =>
      val h = new TopKHeap(7)
      chunk.foreach { case (s, i) => h.offer(s, i) }
      h
    }
    val merged = parts.reduce { (a, b) => a.absorb(b); a }
    assert(
      merged.sortedIndices.map(i => (merged.scores(i), merged.ids(i))).toSeq ===
        whole.sortedIndices.map(i => (whole.scores(i), whole.ids(i))).toSeq)
  }

  test("aggregate matches a window row_number top-k in a real query") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(42)
    val df = Seq.fill(2000)(
      (rng.nextInt(20).toLong, rng.nextLong(), rng.nextInt(5) / 5.0))
      .toDF("g", "id", "score")
      // a (g, id) pair must be unique for the compare to be well-defined
      .dropDuplicates("g", "id")
    val viaAgg = df.groupBy("g")
      .agg(TopKFunctions.top_k_pairs(struct(col("score"), col("id")), 4).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.id").as("id"),
        (col("pos") + 1).cast("int").as("rank"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select("g", "id", "rank")
    assert(
      viaAgg.as[(Long, Long, Int)].collect().toSet ===
        viaWindow.as[(Long, Long, Int)].collect().toSet)
  }

  test("NaN scores never occupy a top-k slot") {
    import spark.implicits._
    // three real scores + one NaN (zero-norm-vector cosine shape): k=3 must
    // return the three real entries, not strand a slot on the NaN
    val out = Seq((1L, 1L, 0.2), (1L, 2L, Double.NaN), (1L, 3L, 0.9),
      (1L, 4L, 0.5))
      .toDF("g", "id", "s")
      .groupBy("g")
      .agg(TopKFunctions.top_k_pairs(struct(col("s"), col("id")), 3).as("t"))
      .selectExpr("transform(t, x -> x.id) AS ids")
      .as[Seq[Long]].head()
    assert(out === Seq(3L, 4L, 1L))
  }

  test("mismatched input types fail at analysis, not with corrupt ids") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.5)).toDF("g", "id", "s")
    val err = intercept[Exception] {
      df.groupBy("g")
        .agg(TopKFunctions.top_k_pairs(struct(col("s"), col("id")), 2))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("struct<score: double, id: bigint>")
      || err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("graft_top_k is callable from SQL") {
    import spark.implicits._
    graft.GraftExtensions.install(spark)
    Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.7))
      .toDF("g", "id", "s").createOrReplaceTempView("tk")
    val out = spark.sql(
      "SELECT g, graft_top_k(struct(s, id), 2) AS t FROM tk GROUP BY g")
      .selectExpr("g", "t[0].id", "t[1].id")
      .as[(Long, Long, Long)].head()
    assert(out === ((1L, 11L, 12L)))
  }
}
