package graft

import graft.operators.Quantiles

class QuantilesSpec extends GraftSuite {
  import spark.implicits._

  test("bounded domain routes exact and matches the sorted definition") {
    val vals = (1 to 1000).map(i => (i % 7) + 1)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val r = Quantiles.grouped(df, "g", "v", Seq(0.25, 0.5, 0.75))
    assert(r.exact, s"7-value domain must take the exact path ($r)")
    assert(r.domainEstimate <= 10)
    val row = r.result.head()
    val s = vals.sorted
    def exact(f: Double): Double = {
      val pos = f * (s.length - 1)
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    for ((f, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex)
      assert(row.getDouble(i + 1) == exact(f), s"frac $f")
  }

  test("wide domain routes to the sketch with bounded rank error") {
    val n = 200000
    val df = (1 to n).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Quantiles.grouped(df, "g", "v", Seq(0.5), maxDomain = 1000)
    assert(!r.exact, "200k-distinct domain must NOT take the map-agg path")
    assert(r.domainEstimate > 1000)
    val med = r.result.head().getDouble(1)
    // GK sketch at accuracy=10000 guarantees rank error ≤ n/10000 = 20
    assert(math.abs(med - n / 2.0) <= n / 10000.0 + 1, s"median $med")
  }

  test("the guard boundary is maxDomain inclusive") {
    val df = (1 to 100).map(v => ("g", v)).toDF("g", "v")
    assert(Quantiles.grouped(df, "g", "v", Seq(0.5), maxDomain = 120).exact)
    assert(!Quantiles.grouped(df, "g", "v", Seq(0.5), maxDomain = 10).exact)
  }
}
