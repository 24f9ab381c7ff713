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

  test("md5Base60/mulAddMod61: bit-identical to the DuckDB SQL twins") {
    import org.apache.spark.unsafe.types.UTF8String
    // expected values computed in DuckDB 1.0.0:
    //   ('0x'||substr(md5(s),1,15))::BIGINT
    assert(ExprRuntimes.md5Base60(UTF8String.fromString("hello")) ===
      419982666956583591L)
    assert(ExprRuntimes.md5Base60(UTF8String.fromString("")) ===
      955282973525019424L)
    val a = ExprRuntimes.md5Base60(UTF8String.fromString("mh|x2p|a|0")) + 1L
    val b = ExprRuntimes.md5Base60(UTF8String.fromString("mh|x2p|b|0"))
    assert(a === 790052429752205874L)
    assert(b === 936339833749929512L)
    //   (a::HUGEINT * x + b) % (2^61 - 1)
    assert(ExprRuntimes.mulAddMod61(a, 419982666956583591L, b) ===
      808921023968476513L)
    //   (1234567890123::HUGEINT * 987654321 + 42) % (2^61 - 1)
    assert(ExprRuntimes.mulAddMod61(987654321L, 1234567890123L, 42L) ===
      1841202383003765397L)
    // boundary: a and x at the top of their declared ranges
    val p = ExprRuntimes.Mersenne61
    assert(ExprRuntimes.mulAddMod61(1L << 60, (1L << 60) - 1, p - 1) ===
      ((BigInt(1) << 60) * ((BigInt(1) << 60) - 1) + p - 1)
        .mod(BigInt(p)).toLong)
    assert(ExprRuntimes.mulAddMod61(0L, 0L, 0L) === 0L)
  }

  test("minhashPortable/simhash60Md5: deterministic, set-functional, bounded") {
    val base = (1 to 80).map(i => s"tok$i")
    val a1 = Array.tabulate(16)(j => 1000003L * (j + 1))
    val b1 = Array.tabulate(16)(j => 7L * j)
    val s1 = ExprRuntimes.minhashPortable(arr(base), a1, b1).toLongArray()
    val s2 = ExprRuntimes.minhashPortable(
      arr(scala.util.Random.shuffle(base.toList)), a1, b1).toLongArray()
    assert(s1.toSeq === s2.toSeq) // order-insensitive (min over the set)
    assert(s1.forall(v => v >= 0 && v < ExprRuntimes.Mersenne61))
    // empty set: MaxValue sentinels (> p, never collide with a real value)
    assert(ExprRuntimes.minhashPortable(arr(Nil), a1, b1).toLongArray()
      .forall(_ == Long.MaxValue))

    val h1 = ExprRuntimes.simhash60Md5(arr(base))
    val h2 = ExprRuntimes.simhash60Md5(arr(scala.util.Random.shuffle(base.toList)))
    assert(h1 === h2)
    assert(h1 >= 0 && h1 < (1L << 60))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = ExprRuntimes.simhash60Md5(arr(base.drop(3) ++ Seq("x1", "x2", "x3")))
    val far = ExprRuntimes.simhash60Md5(arr((1 to 80).map(i => s"zzz$i")))
    assert(ham(h1, near) < ham(h1, far))
    assert(ExprRuntimes.simhash60Md5(arr(Nil)) === 0L) // all ties -> 0 bits
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
