package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are contiguous, order-respecting, partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = rnd.shuffle((0 until 1000).map(i => (s"s${i % 7}", i.toLong)))
    def run(parts: Int) =
      Ids.withGlobalIds(
        rows.toDF("src", "k").repartition(parts),
        Seq(col("src"), col("k")), numPartitions = 5)
        .select("src", "k", "gid")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val a = run(3)
    // contiguous 0..n-1
    a.map(_._3).sorted shouldBe (0L until 1000L).toArray
    // id order == declared (src, k) order
    a.sortBy(_._3).map(t => (t._1, t._2)) shouldBe
      rows.sortBy(t => (t._1, t._2)).toArray
    // invariant to input partitioning
    run(13).sortBy(_._3) shouldBe a.sortBy(_._3)
  }

  test("single short partition and empty input") {
    val one = Ids.withGlobalIds(Seq(("x", 1L)).toDF("s", "k"),
      Seq(col("k")), numPartitions = 4).select("gid").collect()
    one.map(_.getLong(0)) shouldBe Array(0L)
    val none = Ids.withGlobalIds(
      Seq.empty[(String, Long)].toDF("s", "k"), Seq(col("k")))
    none.count() shouldBe 0
  }
}
