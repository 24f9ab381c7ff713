package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's budget governor is artifact policy, not measurement — but a
  * wrong decision silently degrades every recorded number (round 8: a
  * fixed 50%-spent cliff turned a full surface into single cold passes on
  * a throttled host). These pin the pace math as pure functions.
  */
class BenchSpec extends AnyFunSuite {

  // passesFor(est, elapsed, budget, remainingQueries)

  test("no observations yet -> full 3 passes regardless of elapsed") {
    assert(Bench.passesFor(0.0, 1100.0, 1200.0, 148) == 3)
    assert(Bench.passesFor(-1.0, 0.0, 1200.0, 148) == 3)
  }

  test("comfortable pace keeps 3 passes: judge-host shape") {
    // ~0.8 s/pass incl settle, 148 queries, 1200 s budget:
    // 0.8*1.25*148*3 = 444 s projected — fits with room
    assert(Bench.passesFor(0.8, 100.0, 1200.0, 148) == 3)
  }

  test("throttled host degrades 2 then 1 as the projection tightens") {
    // 2.5 s/pass on a throttled host, early in the run:
    // 2.5*1.25*140*3 = 1312 > 0.92*1200 = 1104 -> not 3;
    // x2 = 875, 60+875 = 935 fits -> 2 passes
    assert(Bench.passesFor(2.5, 60.0, 1200.0, 140) == 2)
    // same host, later, budget mostly gone -> 1
    assert(Bench.passesFor(3.0, 800.0, 1200.0, 80) == 1)
  }

  test("degradation recovers: few remaining queries fit 3 again") {
    // even on the slow host, the last handful get full passes back
    assert(Bench.passesFor(3.0, 900.0, 1200.0, 10) == 3)
  }

  test("never returns 0 — the 95% hard stop is the caller's job") {
    assert(Bench.passesFor(50.0, 1190.0, 1200.0, 100) == 1)
  }

  // medianOf(times, requestedPasses)

  test("medianOf: 3 passes takes the middle (cold outlier discarded)") {
    assert(Bench.medianOf(Seq(7.0, 1.1, 1.0), 3) == 1.1)
  }

  test("medianOf: governor-degraded 2 passes takes the MIN, not sorted(1)") {
    // pace-degraded + warm-truncated: first pass is cold codegen
    assert(Bench.medianOf(Seq(6.0, 1.2), 2) == 1.2)
  }

  test("medianOf: 2 survivors of 3 requested keeps the order statistic") {
    // one of 3 passes errored — both survivors are warm, so the min rule
    // would bias low instead of discarding a cold outlier
    assert(Bench.medianOf(Seq(1.0, 1.4), 3) == 1.4)
  }

  test("medianOf: 1 pass is the value; empty is the -1 failure sentinel") {
    assert(Bench.medianOf(Seq(2.5), 1) == 2.5)
    assert(Bench.medianOf(Nil, 3) == -1.0)
  }
}
