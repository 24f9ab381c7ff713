package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel-level pins for the PQ expressions (the DataFrame-level serving
  * behavior lives in SimilaritySpec/EventStreamSpec).
  */
class ProductQuantizeSpec extends AnyFunSuite with Matchers {

  private def arr(xs: Float*): GenericArrayData = new GenericArrayData(xs.toArray)

  test("encode picks the nearest centroid per subspace (ties to smaller)") {
    val books = Seq(
      Seq(Seq(0f, 0f), Seq(1f, 1f)),
      Seq(Seq(2f, 2f), Seq(-2f, -2f)))
    val e = PqEncode(org.apache.spark.sql.catalyst.expressions.Literal(1), books)
    val codes = e.encode(arr(0.9f, 1.1f, -1.8f, -2.2f))
    codes.toIntArray().toSeq shouldBe Seq(1, 1)
  }

  test("ragged vector: BOTH dot and half-norm truncate to overlapping dims") {
    // subspace 2 sees only 1 of its 2 dims (vector length 3 < m*dsub=4).
    // c0 = [1, 10]: huge FULL half-norm (50.5) but best on the overlap;
    // c1 = [0.9, 0]: full and truncated norms agree.
    // Overlap-truncated: c0 scores 1*1 - 0.5 = 0.5, c1 scores 0.9 - 0.405
    // = 0.495 -> c0 wins. Subtracting the FULL half-norm against the
    // truncated dot (the pre-round-9 behavior) would give c0 = -49.5 and
    // flip the winner to c1, biasing ragged input toward small-norm
    // centroids on dims it doesn't even have.
    val books = Seq(
      Seq(Seq(0f, 0f), Seq(5f, 5f)),
      Seq(Seq(1f, 10f), Seq(0.9f, 0f)))
    val e = PqEncode(org.apache.spark.sql.catalyst.expressions.Literal(1), books)
    val codes = e.encode(arr(0f, 0f, 1f))
    codes.toIntArray().toSeq shouldBe Seq(0, 0)
  }

  test("adcDot sums per-subspace dots from codes and skips bad codes") {
    val books = Seq(
      Seq(Seq(1f, 0f), Seq(0f, 1f)),
      Seq(Seq(2f, 0f), Seq(0f, 2f)))
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(1)
    val d = PqAdcDot(lit, lit, books)
    // query [1,2,3,4]: subspace1 code 1 -> dot([1,2],[0,1]) = 2;
    // subspace2 code 0 -> dot([3,4],[2,0]) = 6
    d.adcDot(arr(1f, 2f, 3f, 4f), new GenericArrayData(Array(1, 0))) shouldBe 8.0
    // out-of-range code contributes nothing instead of throwing
    d.adcDot(arr(1f, 2f, 3f, 4f), new GenericArrayData(Array(1, 7))) shouldBe 2.0
  }
}
