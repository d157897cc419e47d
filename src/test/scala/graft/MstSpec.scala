package graft

import graft.graph.Mst
import org.apache.spark.sql.functions._

class MstSpec extends GraftSuite {
  import spark.implicits._

  /** Reference Kruskal with the SAME total order (w, a, b) — union-find
    * on the driver, for cross-checking the distributed Boruvka. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map { case (s, d, w) => (s min d, s max d, w) }
      .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = Set.newBuilder[(Long, Long, Long)]
    for ((a, b, w) <- canon.sortBy { case (a, b, w) => (w, a, b) }) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra max rb) = ra min rb; out += ((a, b, w)) }
    }
    out.result()
  }

  private def run(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Mst.boruvka(edges.toDF("src", "dst", "w")).edges
      .select("a", "b", "w").as[(Long, Long, Long)].collect().toSet

  test("boruvka equals kruskal on a hand-checked graph") {
    // square 1-2-3-4 with a heavy diagonal and a pendant 5
    val g = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (4L, 1L, 5L),
      (1L, 3L, 9L), (4L, 5L, 3L))
    val got = run(g)
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (4L, 5L, 3L)))
    assert(got == kruskal(g))
  }

  test("boruvka equals kruskal on a seeded random multi-component graph") {
    val rnd = new scala.util.Random(11)
    // two islands of 30 vertices each (ids 0-29, 100-129), random extra
    // edges, DUPLICATE weights so the (w, a, b) tiebreak carries
    def island(base: Long) = {
      val ring = (0 until 30).map(i =>
        (base + i, base + (i + 1) % 30, (rnd.nextInt(7) + 1).toLong))
      val extra = (0 until 40).map { _ =>
        val a = base + rnd.nextInt(30); val b = base + rnd.nextInt(30)
        (a, b, (rnd.nextInt(7) + 1).toLong)
      }
      ring ++ extra
    }
    val g = island(0L) ++ island(100L)
    val got = run(g)
    val want = kruskal(g)
    assert(got == want, s"boruvka ${got.size} edges vs kruskal ${want.size}")
    // forest invariant: V - C edges
    assert(got.size == 60 - 2)
  }

  test("labels partition vertices; per-component edge count is size - 1") {
    val g = Seq((1L, 2L, 4L), (2L, 3L, 4L), (10L, 11L, 1L))
    val f = Mst.boruvka(g.toDF("src", "dst", "w"))
    val lab = f.labels.as[(Long, Long)].collect().toMap
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val perComp = f.edges.groupBy("comp").count()
      .as[(Long, Long)].collect().toMap
    assert(perComp == Map(1L -> 2L, 10L -> 1L))
  }

  test("empty input and parallel/self edges") {
    val empty = Mst.boruvka(Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w"))
    assert(empty.edges.count() == 0 && empty.labels.count() == 0)
    // parallel edges keep the lightest; self-loop ignored
    val g = Seq((1L, 2L, 9L), (2L, 1L, 3L), (1L, 1L, 1L))
    assert(run(g) == Set((1L, 2L, 3L)))
  }

  test("single-linkage cut of the forest equals CC of the thresholded graph") {
    // the minimax-path property the single_linkage gate stands on: for
    // every threshold t, components of {forest edges ≤ t} equal
    // components of {ALL edges ≤ t} — including the ε-cut special case
    // t = max (DBSCAN.py:161-172), where both equal plain CC
    val rnd = new scala.util.Random(7)
    val g = (0 until 120).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
        (rnd.nextInt(9) + 1).toLong)
    }.filter(e => e._1 != e._2)
    val f = Mst.boruvka(g.toDF("src", "dst", "w"))
    for (t <- Seq(2L, 5L, 9L)) {
      val cutForest = graft.graph.ConnectedComponents.run(
          f.edges.where(col("w") <= t)
            .select(col("a").as("src"), col("b").as("dst")))
        .as[(Long, Long)].collect().toMap
      val cutFull = graft.graph.ConnectedComponents.run(
          g.toDF("src", "dst", "w").where(col("w") <= t)
            .select("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(cutForest == cutFull, s"cut at $t diverges")
    }
  }

  test("boruvka is partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val g = (0 until 80).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
        (rnd.nextInt(9) + 1).toLong)
    }
    val a = Mst.boruvka(g.toDF("src", "dst", "w").repartition(1)).edges
      .select("a", "b", "w").as[(Long, Long, Long)].collect().toSet
    val b = Mst.boruvka(g.toDF("src", "dst", "w").repartition(13)).edges
      .select("a", "b", "w").as[(Long, Long, Long)].collect().toSet
    assert(a == b && a == kruskal(g))
  }
}
