package graft

import org.scalacheck.{Arbitrary, Prop, Test => SCTest}

/** Thin scalacheck runner usable from scalatest suites without the
  * scalatest-plus bridge (not present in the offline artifact cache).
  */
object Check {
  /** Pinned seed: a rare generator draw must not flip a round green/red —
    * two consecutive `sbt test` runs are bit-identical in outcome. Bump the
    * seed deliberately (with the failure fixed) to widen coverage.
    */
  val PinnedSeed: Long = 0x67726166745f7233L // "graft_r3"

  val params: SCTest.Parameters = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(PinnedSeed))

  def holds[A: Arbitrary](f: A => Boolean): Boolean =
    SCTest.check(params, Prop.forAll(f)).passed

  def holds2[A: Arbitrary, B: Arbitrary](f: (A, B) => Boolean): Boolean =
    SCTest.check(params, Prop.forAll(f)).passed
}
