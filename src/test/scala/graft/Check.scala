package graft

import org.scalacheck.{Arbitrary, Prop, Test => SCTest}

/** Thin scalacheck runner usable from scalatest suites without the
  * scalatest-plus bridge (not present in the offline artifact cache).
  */
object Check {
  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)

  def holds[A: Arbitrary](f: A => Boolean): Boolean =
    SCTest.check(params, Prop.forAll(f)).passed

  def holds2[A: Arbitrary, B: Arbitrary](f: (A, B) => Boolean): Boolean =
    SCTest.check(params, Prop.forAll(f)).passed
}
