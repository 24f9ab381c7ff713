package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 2000 rows of key 1 (hot), a 200-row warm key, 300 distinct cold keys;
  // right side covers some keys and misses others (id 999, 1001..)
  private def skewedLeft: DataFrame =
    (Seq.fill(2000)(1L) ++ Seq.fill(200)(2L) ++ (3L to 302L) :+ 999L)
      .zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")

  private def rightDim: DataFrame =
    ((1L to 250L) :+ 1001L).map(k => (k, s"dim$k")).toDF("rk", "attr")

  private def plain(jt: String) =
    skewedLeft.join(rightDim, col("k") === col("rk"), jt)

  private def sorted(df: DataFrame) =
    df.select("k", "payload", "rk", "attr")
      .orderBy("k", "payload").collect().toSeq

  test("inner hybrid join equals the plain join") {
    val got = SkewJoin.join(skewedLeft, "k", rightDim, "rk",
      topK = 10, tasks = 8)
    sorted(got) shouldBe sorted(plain("inner"))
  }

  test("left-outer hybrid join equals the plain join (unmatched kept)") {
    val got = SkewJoin.join(skewedLeft, "k", rightDim, "rk",
      joinType = "left", topK = 10, tasks = 8)
    sorted(got) shouldBe sorted(plain("left"))
  }

  test("salted variant equals the plain join too") {
    val got = SkewJoin.join(skewedLeft, "k", rightDim, "rk",
      topK = 10, tasks = 8, broadcastHot = false, saltFactor = 4)
    sorted(got) shouldBe sorted(plain("inner"))
  }

  test("null probe keys: dropped by inner, kept by left join") {
    val l = Seq[(java.lang.Long, String)]((1L, "a"), (null, "n"), (1L, "b"))
      .toDF("k", "v")
    val r = Seq((1L, "x")).toDF("rk", "w")
    // force key 1 hot: 2 of 3 rows, tasks=2 -> salt 2
    val inner = SkewJoin.join(l, "k", r, "rk", topK = 5, tasks = 2)
    inner.count() shouldBe 2
    val louter = SkewJoin.join(l, "k", r, "rk", joinType = "left",
      topK = 5, tasks = 2)
    louter.count() shouldBe 3
    louter.filter(col("k").isNull).count() shouldBe 1
  }

  test("no hot keys -> falls back to the single plain join") {
    val uniform = (1L to 100L).map((_, "p")).toDF("k", "payload")
    val got = SkewJoin.join(uniform, "k", rightDim, "rk",
      topK = 10, tasks = 4)
    // fallback plan: one join, no union
    assert(!got.queryExecution.executedPlan.toString.contains("Union"))
    got.count() shouldBe 100
  }

  test("hot path broadcasts; cold path keeps the shuffle join") {
    val got = SkewJoin.join(skewedLeft, "k", rightDim, "rk",
      topK = 10, tasks = 8)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
