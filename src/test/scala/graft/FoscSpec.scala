package graft

import graft.graph.{ConnectedComponents, Fosc}
import org.apache.spark.sql.functions._

class FoscSpec extends GraftSuite {

  test("Fosc.select achieves the brute-force max-weight antichain value") {
    // FOSC's bottom-up DP (Campello PAKDD'13 §4) claims optimality over
    // all non-overlapping selections — on a tree that is exactly the
    // max-weight antichain. Enumerate every subset of small random trees
    // and compare achieved total stability.
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { trial =>
      val n = 2 + rnd.nextInt(9)
      // labels 0..n-1 with parent(x) < x (the min-id labeling invariant)
      val parent = (1 until n).map(x => x.toLong -> rnd.nextInt(x).toLong).toMap
      val stab = (0 until n).map(x => x.toLong -> (1L + rnd.nextInt(20))).toMap
      def ancestors(x: Long): Set[Long] = parent.get(x)
        .map(p => ancestors(p) + p).getOrElse(Set.empty)
      def isAntichain(s: Set[Long]): Boolean =
        s.forall(x => ancestors(x).forall(a => !s.contains(a)))
      val best = (0 until (1 << n)).iterator
        .map(m => (0 until n).filter(i => (m & (1 << i)) != 0).map(_.toLong).toSet)
        .filter(isAntichain)
        .map(_.toSeq.map(stab).sum)
        .max
      val sel = Fosc.select(stab, parent)
      assert(isAntichain(sel), s"trial=$trial selection overlaps: $sel")
      assert(sel.toSeq.map(stab).sum === best,
        s"trial=$trial FOSC total ${sel.toSeq.map(stab).sum} != optimal $best " +
          s"(parent=$parent stab=$stab sel=$sel)")
    }
  }

  test("single-cut extraction degenerates to the threshold-cut components") {
    // the ε-cut special case (DBSCAN.py:172-179 regroups clusters as
    // components of the ε-graph): with ONE cut every cluster label is a
    // root, FOSC selects them all, and the flat labeling must equal the
    // connected components of the thresholded edge set
    import spark.implicits._
    val cut = 5L
    val edges = Seq(
      (1L, 2L, 3L), (2L, 3L, 4L), (3L, 4L, 9L),   // 9 > cut: splits
      (10L, 11L, 1L), (11L, 12L, 5L),
      (20L, 21L, 7L)                                // dropped entirely
    ).toDF("src", "dst", "w")
    val admitted = edges.where(col("w") <= cut)
    val comp = ConnectedComponents.run(
      admitted.select("src", "dst"))
    // one-cut condensed tree: per-label mass = component size, no parents
    val stab = comp.groupBy("component").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sel = Fosc.select(stab, Map.empty)
    assert(sel === stab.keySet, "every root label must be selected")
    val flat = comp.select(col("id"), col("component"))
      .where(col("component").isin(sel.toSeq: _*))
    assert(flat.exceptAll(comp).isEmpty && comp.exceptAll(flat).isEmpty,
      "single-cut flat labels must equal the cut components")
    // isolated-at-cut vertices (4's only edge exceeds the cut; 20, 21
    // dropped entirely) are exactly the noise set
    val labeled = flat.select("id").as[Long].collect().toSet
    assert(labeled === Set(1L, 2L, 3L, 10L, 11L, 12L))
  }

  test("select enforces the driver-scalar contract on malformed trees") {
    intercept[IllegalArgumentException] {
      Fosc.select(Map(1L -> 5L), Map(1L -> 2L)) // parent missing from stab
    }
    intercept[IllegalArgumentException] {
      Fosc.select(Map(1L -> 5L, 2L -> 3L), Map(1L -> 2L)) // parent > child
    }
  }
}
