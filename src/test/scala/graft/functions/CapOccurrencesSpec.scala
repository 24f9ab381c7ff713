package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CapOccurrencesSpec extends AnyFunSuite with Matchers {

  private def run(cap: Int, xs: Int*): Seq[Int] =
    CapOccurrences(Literal(1), cap)
      .capArr(new GenericArrayData(xs.toArray))
      .toIntArray().toSeq

  test("keeps at most cap copies of each value, sorted") {
    run(3, 5, 1, 5, 5, 5, 1, 2) shouldBe Seq(1, 1, 2, 5, 5, 5)
    run(1, 9, 9, 9, 3) shouldBe Seq(3, 9)
  }

  test("under-cap rows pass through (sorted) unchanged") {
    run(3, 4, 2, 7) shouldBe Seq(2, 4, 7)
    run(3) shouldBe Seq()
  }

  test("null slots are dropped, not crashed on (containsNull=true inputs)") {
    CapOccurrences(Literal(1), 2)
      .capArr(new GenericArrayData(Array[Any](5, null, 5, null, 1)))
      .toIntArray().toSeq shouldBe Seq(1, 5, 5)
  }

  test("rejects non-int-array input at analysis, not at runtime") {
    CapOccurrences(Literal("x"), 2)
      .checkInputDataTypes().isSuccess shouldBe false
    CapOccurrences(Literal.create(Seq(1), org.apache.spark.sql.types
      .ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = true)), 2)
      .checkInputDataTypes().isSuccess shouldBe true
  }

  test("agrees with a groupBy-count reference on seeded random arrays") {
    val rng = new scala.util.Random(graft.Check.PinnedSeed)
    (1 to 100).foreach { _ =>
      val cap = 1 + rng.nextInt(4)
      val xs = Seq.fill(rng.nextInt(60))(rng.nextInt(10))
      val expected = xs.sorted.groupBy(identity).toSeq.sortBy(_._1)
        .flatMap { case (v, vs) => vs.take(cap) }
      run(cap, xs: _*) shouldBe expected
    }
  }
}
