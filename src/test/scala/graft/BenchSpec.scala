package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exercises the bench harness's noise/scaling thresholds directly —
  * the r7 round shipped a 53.4s steal sample for a 5-7s query and a
  * 12.7x scaling step that evaded the old 15x-only flag, so the
  * thresholds themselves are now under test.
  */
class BenchSpec extends AnyFunSuite {

  test("retry threshold is max(5s, 3x smaller-scale baseline)") {
    // no baseline (smallest scale, or scaling disabled): flat 5s
    assert(Bench.retryThreshold(None) == 5.0)
    // cheap baseline: the 5s floor dominates — sub-second queries are
    // not retried just because 3x their baseline is tiny
    assert(Bench.retryThreshold(Some(0.4)) == 5.0)
    // heavy baseline: 3x dominates — a legitimately 3.6s-at-sf0.01
    // query gets a 10.8s budget at sf0.1 before a retry fires
    assert(math.abs(Bench.retryThreshold(Some(3.6)) - 10.8) < 1e-9)
    // the r7 incident: q80 baseline ~3.6s, steal sample 53.4s — well
    // over threshold, would have been re-measured
    assert(53.4 > Bench.retryThreshold(Some(3.6)))
  }

  test("scaling flag fires on >8x growth above the 2s floor") {
    // 9x step on a non-trivial query: flagged with the ratio
    assert(Bench.scaleFlag(prev = 0.5, last = 4.5).exists(_.startsWith("ratio")))
    // 7x step: under the tightened threshold, clean
    assert(Bench.scaleFlag(prev = 1.0, last = 7.0).isEmpty)
    // 20x step but last under the 2s floor: fixed per-query overhead,
    // not an operator blow-up — clean
    assert(Bench.scaleFlag(prev = 0.05, last = 1.0).isEmpty)
    // the r7 miss: 4.2s -> 53.4s is 12.7x; the old 15x gate let it
    // through, the 8x gate catches it
    assert(Bench.scaleFlag(prev = 4.2, last = 53.4).exists(_.startsWith("ratio")))
  }

  test("absolute trigger flags any >15s main-scale query regardless of ratio") {
    // an inflated baseline launders the ratio (16/4 = 4x) but 16s
    // absolute still flags
    assert(Bench.scaleFlag(prev = 4.0, last = 16.0).exists(_.startsWith("absolute")))
    // heavy-but-bounded query below the absolute line, sublinear step:
    // clean
    assert(Bench.scaleFlag(prev = 3.6, last = 7.1).isEmpty)
    // zero baseline (prev errored or instant): no ratio, absolute
    // still governs
    assert(Bench.scaleFlag(prev = 0.0, last = 20.0).exists(_.startsWith("absolute")))
    assert(Bench.scaleFlag(prev = 0.0, last = 10.0).isEmpty)
  }
}
