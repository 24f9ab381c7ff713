package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.Check

/** Property tests for the shared expression kernels — these run WITHOUT a
  * SparkSession (pure functions over ArrayData), so scalacheck can hammer
  * them cheaply.
  */
class ExprRuntimesSpec extends AnyFunSuite with Matchers {

  private def arr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private def sortedSet(xs: List[String]): Seq[String] =
    xs.distinct.sortBy(UTF8String.fromString) // binary order, like array_sort

  test("jaccardSorted equals the naive set formula (property)") {
    assert(Check.holds2 { (xs: List[String], ys: List[String]) =>
      val a = xs.toSet
      val b = ys.toSet
      val expected =
        if ((a ++ b).isEmpty) 0.0
        else (a & b).size.toDouble / (a ++ b).size
      val got = ExprRuntimes.jaccardSorted(
        arr(sortedSet(xs)), arr(sortedSet(ys)))
      math.abs(got - expected) < 1e-12
    })
  }

  test("jaccardSorted: identity is 1 for non-empty, 0 for empty") {
    assert(Check.holds { (xs: List[String]) =>
      val s = sortedSet(xs)
      val j = ExprRuntimes.jaccardSorted(arr(s), arr(s))
      if (s.isEmpty) j == 0.0 else j == 1.0
    })
  }

  test("minhash: equal sets agree; signature length is k (property)") {
    assert(Check.holds { (xs: List[String]) =>
      val a = ExprRuntimes.minhash(arr(xs.distinct), 16)
      val b = ExprRuntimes.minhash(arr(scala.util.Random.shuffle(xs.distinct)), 16)
      a.numElements() == 16 &&
        a.toLongArray().toSeq == b.toLongArray().toSeq // order-insensitive
    })
  }

  test("minhash: signature similarity tracks Jaccard on a planted pair") {
    val base = (1 to 100).map(i => s"tok$i")
    val near = base.drop(10) ++ (1 to 10).map(i => s"new$i") // J = 90/110
    val far = (1 to 100).map(i => s"other$i")
    def sig(xs: Seq[String]) = ExprRuntimes.minhash(arr(xs), 256).toLongArray()
    def sim(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    val nearSim = sim(sig(base), sig(near))
    val farSim = sim(sig(base), sig(far))
    assert(nearSim > 0.7 && nearSim < 0.95) // E ≈ 0.818
    assert(farSim < 0.1)
  }

  test("simhash: order-insensitive, near sets within small hamming") {
    val base = (1 to 100).map(i => s"tok$i")
    def h(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val s1 = ExprRuntimes.simhash64(arr(base), 0L)
    val s2 = ExprRuntimes.simhash64(arr(scala.util.Random.shuffle(base.toList)), 0L)
    assert(s1 === s2)
    val near = ExprRuntimes.simhash64(arr(base.drop(3) ++ Seq("x1", "x2", "x3")), 0L)
    val far = ExprRuntimes.simhash64(arr((1 to 100).map(i => s"zzz$i")), 0L)
    assert(h(s1, near) < h(s1, far))
  }

  test("vectorDot/vectorNorm agree with BLAS-style reference (property)") {
    assert(Check.holds { (xs: List[Float]) =>
      val clean = xs.filterNot(x => x.isNaN || x.isInfinite).take(64)
      val a = new GenericArrayData(clean.toArray[Any])
      val dot = ExprRuntimes.vectorDot(a, a)
      val norm = ExprRuntimes.vectorNorm(a)
      val expected = clean.map(x => x.toDouble * x.toDouble).sum
      math.abs(dot - expected) <= math.ulp(expected) * 8 &&
        math.abs(norm - math.sqrt(expected)) < 1e-9 * (1 + math.sqrt(expected))
    })
  }
}
