package graft

import org.scalatest.funsuite.AnyFunSuite

/** Storm-window guard (VERDICT r19 item 6): a bench run taken inside a
  * CPU-steal storm must not overwrite the committed clean
  * BENCH_LAST.json — r19's driver capture (steal 76.2 s, median_ratio
  * 1.29) clobbered the 199.4 s clean artifact in the working tree.
  * Thresholds are quoted from BASELINE.md's adjudications: committed
  * clean windows at steal ≤ 9.2 s / median_ratio ≤ 0.99; discarded
  * windows at main-pass steal 21–117 s / median_ratio ≥ 1.29. No Spark
  * session needed: the guard is a pure predicate.
  */
class BenchSpec extends AnyFunSuite {

  test("committed clean windows from BASELINE.md pass the guard") {
    // r19 committed: steal 9.2 s, median_ratio 0.90
    assert(!Bench.isStormWindow(9.2, 0.90))
    // r18 committed: steal 0.98 s, median_ratio 0.92
    assert(!Bench.isStormWindow(0.98, 0.92))
    // r11 host-slow epoch: near-zero steal, uniformly elevated but
    // committed (median_ratio 0.99 vs its own history)
    assert(!Bench.isStormWindow(0.33, 0.99))
  }

  test("discarded storm windows from BASELINE.md trip the guard") {
    // r19 driver capture: 76.2 s steal at median_ratio 1.29
    assert(Bench.isStormWindow(76.2, 1.29))
    // r18 discarded window: 84 s steal storm
    assert(Bench.isStormWindow(84.0, 1.0))
    // r19 discarded windows: main-pass steal 21-117 s
    assert(Bench.isStormWindow(21.0, 0.95))
    assert(Bench.isStormWindow(117.0, 1.3))
    // uniform inflation with the steal counter missing still trips on
    // the ratio alone (steal -1 = unreadable /proc/stat)
    assert(Bench.isStormWindow(-1.0, 1.29))
  }

  test("sentinels do not trip the guard") {
    // no same-sf history (first run at a new scale factor) and an
    // unreadable /proc/stat must both read as NOT-storm
    assert(!Bench.isStormWindow(-1.0, -1.0))
    assert(!Bench.isStormWindow(0.0, -1.0))
  }

  test("mode-adjusted totals against the BASELINE.md precedents") {
    // VERDICT r20 item 7: total / median_ratio, milli-rounded.
    // r20 clean driver window: 211.719 s at median_ratio 0.95
    assert(Bench.modeAdjusted(211.719, 0.95) === 222.862)
    // r21 committed clean window: 172.76 s at 0.85
    assert(Bench.modeAdjusted(172.76, 0.85) === 203.247)
    // no same-sf history: median_ratio -1 → sentinel, never a division
    assert(Bench.modeAdjusted(199.4, -1.0) === -1.0)
    assert(Bench.modeAdjusted(199.4, 0.0) === -1.0)
  }
}
