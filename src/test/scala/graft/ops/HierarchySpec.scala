package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def tree(pairs: (Long, java.lang.Long)*) =
    pairs.toSeq.toDF("id", "parent")

  test("perfect binary tree: roots, depths, and full paths") {
    // ids 1..15, parent = id/2, root 1
    val df = (1L to 15L)
      .map(i => (i, if (i == 1) null else java.lang.Long.valueOf(i / 2)))
      .toDF("id", "parent")
    val out = Hierarchy.flatten(df, "id", "parent")
      .orderBy("id").collect()
    out.length shouldBe 15
    out.foreach(_.getLong(1) shouldBe 1L) // all root to 1
    out.map(_.getLong(2)) shouldBe
      (1L to 15L).map(i => (math.log(i.toDouble) / math.log(2)).toLong)
        .toArray
    out(10).getSeq[Long](3) shouldBe Seq(1L, 2L, 5L, 11L) // id = 11
  }

  test("forest: independent roots stay independent") {
    val df = tree((1L, null), (2L, 1L), (10L, null), (11L, 10L), (12L, 11L))
    val out = Hierarchy.flatten(df, "id", "parent")
      .orderBy("id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((1L, 1L, 0L), (2L, 1L, 1L), (10L, 10L, 0L), (11L, 10L, 1L),
        (12L, 10L, 2L))
  }

  test("self-parent counts as root; dangling parent is an implicit root") {
    val df = tree((5L, 5L), (6L, 5L), (7L, 99L))
    val out = Hierarchy.flatten(df, "id", "parent")
      .orderBy("id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((5L, 5L, 0L), (6L, 5L, 1L), (7L, 99L, 1L))
  }

  test("depth-100 chain resolves in O(log depth) doublings") {
    val df = (0L to 100L)
      .map(i => (i, if (i == 0) null else java.lang.Long.valueOf(i - 1)))
      .toDF("id", "parent")
    // 2^8 = 256 > 100: 9 rounds suffice; maxRounds=10 proves log behavior
    val out = Hierarchy.flatten(df, "id", "parent", maxRounds = 10)
      .orderBy("id").collect()
    out.last.getLong(2) shouldBe 100L
    out.last.getSeq[Long](3) shouldBe (0L to 100L)
  }

  test("a parent cycle fails loudly instead of looping") {
    val df = tree((1L, 2L), (2L, 1L))
    val e = intercept[IllegalArgumentException] {
      Hierarchy.flatten(df, "id", "parent", maxRounds = 5)
    }
    assert(e.getMessage.contains("unresolved"), e.getMessage)
  }
}
