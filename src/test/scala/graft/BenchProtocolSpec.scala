package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench run-quality protocol (round 15): drift quarantine with
  * two-run confirmation, outlier-trimmed envelope bounds, contended-gate
  * exclusion. Each scenario replays the round-14 failure it guards
  * against (span_strip: a 31.8 s contended median appended into a
  * 1.9–2.1 s envelope). */
class BenchProtocolSpec extends AnyFunSuite {
  import BenchProtocol._

  // ---- envelopeBounds -------------------------------------------------

  test("envelope with <= 3 entries uses raw min/max") {
    assert(envelopeBounds(Seq(2.0)) === ((2.0, 2.0)))
    assert(envelopeBounds(Seq(1.9, 2.1, 2.0)) === ((1.9, 2.1)))
  }

  test("envelope with >= 4 entries drops one extreme at each end") {
    // a planted 10x historical entry must NOT widen the flag boundary
    val poisoned = Seq(2.0, 2.1, 1.9, 20.0)
    val (lo, hi) = envelopeBounds(poisoned)
    assert(lo === 2.0 && hi === 2.1)
    // symmetric: a rogue fast entry doesn't widen the low side
    val (lo2, hi2) = envelopeBounds(Seq(0.1, 2.0, 2.1, 1.9))
    assert(lo2 === 1.9 && hi2 === 2.0)
  }

  test("a median inside a clean envelope never flags; a 15x one does") {
    val h = Seq(1.915, 2.106)
    assert(!isDrift(2.0, h))
    assert(!isDrift(2.6, h))   // 2.106 * 1.3 = 2.74 — inside slack
    assert(isDrift(31.765, h)) // the r14 span_strip catch
    assert(isDrift(1.0, h))    // low-side exit also flags
  }

  test("drift is suppressed below the noise floor") {
    // sub-0.3s medians move 1.3-1.4x on scheduler noise alone
    assert(!isDrift(0.25, Seq(0.1, 0.12)))
    // but a small median against a LARGE envelope still flags (collapse)
    assert(isDrift(0.05, Seq(2.0, 2.1)))
  }

  test("empty history never flags (first quiet run seeds)") {
    assert(!isDrift(5.0, Seq.empty))
  }

  test("a poisoned envelope still catches a regression after trimming") {
    // r14 aftermath: span_strip history [1.915, 2.106, 31.765]. With raw
    // min/max a 20x regression (40s) passes (31.765 * 1.3 = 41.3); with
    // only 3 entries the trim can't engage, so this is the 4-entry case
    val h = Seq(1.915, 2.106, 1.950, 31.765)
    assert(isDrift(40.0, h))
    assert(!isDrift(2.0, h))
  }

  // ---- mergeHistory: quarantine + confirmation ------------------------

  private val clean = Map("span_strip" -> Seq(1.915, 2.106))

  test("flag-without-append: a drift-flagged median is held pending") {
    val (h, p) = mergeHistory(clean, Map.empty,
      Map("span_strip" -> 31.765), flagged = Set("span_strip"),
      contended = Set.empty)
    assert(h("span_strip") === Seq(1.915, 2.106)) // envelope untouched
    assert(p === Map("span_strip" -> 31.765))     // parked, not baseline
  }

  test("one-off contention clears: next in-envelope draw drops pending") {
    val (h, p) = mergeHistory(clean, Map("span_strip" -> 31.765),
      Map("span_strip" -> 2.0), flagged = Set.empty, contended = Set.empty)
    assert(h("span_strip") === Seq(1.915, 2.106, 2.0))
    assert(p.isEmpty)
  }

  test("a real shift baselines on the second confirming quiet run") {
    // code change makes the gate 4x faster: 2.0s -> 0.5s, twice
    val (h1, p1) = mergeHistory(clean, Map.empty,
      Map("span_strip" -> 0.5), flagged = Set("span_strip"),
      contended = Set.empty)
    assert(h1("span_strip") === Seq(1.915, 2.106) && p1("span_strip") === 0.5)
    val (h2, p2) = mergeHistory(h1, p1,
      Map("span_strip" -> 0.52), flagged = Set("span_strip"),
      contended = Set.empty)
    assert(h2("span_strip") === Seq(0.52)) // reseeded to the new level
    assert(p2.isEmpty)
  }

  test("a disagreeing second flag replaces pending, never baselines") {
    val (h, p) = mergeHistory(clean, Map("span_strip" -> 31.765),
      Map("span_strip" -> 9.0), flagged = Set("span_strip"),
      contended = Set.empty)
    assert(h("span_strip") === Seq(1.915, 2.106))
    assert(p === Map("span_strip" -> 9.0))
  }

  test("contended gates carry history AND pending forward unchanged") {
    val (h, p) = mergeHistory(clean, Map("span_strip" -> 31.765),
      Map("span_strip" -> 2.0), flagged = Set.empty,
      contended = Set("span_strip"))
    assert(h("span_strip") === Seq(1.915, 2.106))
    assert(p === Map("span_strip" -> 31.765))
  }

  test("clean appends cap at HistoryDepth and keep the newest entries") {
    val deep = Map("g" -> (1 to 8).map(_.toDouble))
    val (h, _) = mergeHistory(deep, Map.empty, Map("g" -> 9.0),
      flagged = Set.empty, contended = Set.empty)
    assert(h("g") === (2 to 9).map(_.toDouble))
  }

  test("gates absent from this run and new gates both behave") {
    val (h, p) = mergeHistory(Map("old" -> Seq(1.0)), Map("old" -> 5.0),
      Map("fresh" -> 3.0), flagged = Set.empty, contended = Set.empty)
    assert(h("old") === Seq(1.0))   // retired gate preserved
    assert(p("old") === 5.0)        // its pending survives too
    assert(h("fresh") === Seq(3.0)) // first draw seeds
  }

  test("confirms is the drift slack applied both ways") {
    assert(confirms(2.0, 2.0))
    assert(confirms(2.5, 2.0) && confirms(2.0, 2.5))
    assert(!confirms(2.7, 2.0) && !confirms(2.0, 2.7))
  }
}
