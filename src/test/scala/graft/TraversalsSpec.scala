package graft

import graft.graph.Traversals
import org.apache.spark.sql.functions._

class TraversalsSpec extends GraftSuite {
  import spark.implicits._

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long],
                   maxHops: Int = 32): Map[Long, Int] =
    Traversals.bfsHops(edges.toDF("src", "dst"), seeds.toDF("id"), maxHops)
      .as[(Long, Int)].collect().toMap

  test("bfs on a path counts hops from the seed") {
    val got = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L))
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("multi-source bfs takes the minimum over seeds; other components unreached") {
    val got = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)), Seq(1L, 4L))
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("cyclic graphs: two-layer dedup equals visited-set semantics") {
    // The round-15 anti-join keeps only the previous TWO layers; cycles
    // are where candidates actually collide with layers k-1 and k-2.
    // Odd cycle 0-1-2-3-4-0: layer1 {1,4}, layer2 {2,3}, then layer-2
    // candidates {1,4} (k-2) and {2,3} (k-1) must all be deduped away.
    val odd = hops(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L)), Seq(0L))
    assert(odd == Map(0L -> 0, 1L -> 1, 4L -> 1, 2L -> 2, 3L -> 2))
    // Even cycle plus a chord back to the seed: every vertex re-reaches
    // the seed (distance k-2 collision at every step).
    val chord = hops(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (2L, 0L)), Seq(0L))
    assert(chord == Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 1))
    // seeded variant on the odd cycle: per-seed layers, same property
    val sh = Traversals.seededHops(
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L)).toDF("src", "dst"),
      Seq(0L, 2L).toDF("id"))
      .as[(Long, Long, Int)].collect().toSet
    assert(sh == Set((0L, 0L, 0), (0L, 1L, 1), (0L, 4L, 1), (0L, 2L, 2),
      (0L, 3L, 2), (2L, 2L, 0), (2L, 1L, 1), (2L, 3L, 1), (2L, 0L, 2),
      (2L, 4L, 2)))
  }

  test("seeded hops track each seed separately; harmonic sums exact ppm") {
    // path 1-2-3-4 plus isolated pair 10-11; seeds 1 and 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("id")
    val sh = Traversals.seededHops(edges, seeds)
      .as[(Long, Long, Int)].collect().toSet
    assert(sh == Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3),
      (4L, 4L, 0), (4L, 3L, 1), (4L, 2L, 2), (4L, 1L, 3)))
    val h = Traversals.harmonicCentrality(edges, seeds)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, p) => id -> (n, p) }.toMap
    // vertex 2: d(1,2)=1, d(4,2)=2 → 1000000 + 500000
    assert(h(2L) == ((2L, 1500000L)) && h(3L) == ((2L, 1500000L)))
    // endpoints see only the OTHER seed (own distance 0 excluded)
    assert(h(1L) == ((1L, 333333L)) && h(4L) == ((1L, 333333L)))
    assert(!h.contains(10L) && !h.contains(11L), "unreached stays absent")
  }

  test("harmonic centrality: empty seeds yield no rows; hop cap truncates") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Traversals.harmonicCentrality(edges,
      Seq.empty[Long].toDF("id")).count() == 0)
    // radius 1 from seed 1: only vertex 2 is reached
    val h = Traversals.harmonicCentrality(edges, Seq(1L).toDF("id"),
        maxHops = 1)
      .as[(Long, Long, Long)].collect()
    assert(h.toSeq == Seq((2L, 1L, 1000000L)))
  }

  test("clustering coefficient: triangle saturates, path reads zero") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ct = Traversals.clusteringCoeff(tri)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ct == Set((1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 2L, 1L, 1000000L)))
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val cp = Traversals.clusteringCoeff(path)
      .as[(Long, Long, Long, Long)].collect()
    assert(cp.length == 3 && cp.forall(_._4 == 0L),
      s"all three path vertices report, none with a triangle: ${cp.toSeq}")
  }

  test("personalized pagerank: unit mass, seed locality, empty-seed zeros") {
    // two symmetric triangles bridged by one edge; seed in triangle A
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L),
      (4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L), (6L, 4L), (4L, 6L),
      (3L, 4L), (4L, 3L))
    val pr = Traversals.personalizedPageRank(tri.toDF("src", "dst"),
        Seq(1L).toDF("id"), iters = 20)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9,
      s"walk mass must stay a distribution: ${pr.values.sum}")
    assert(pr(1L) > pr(4L) && pr(2L) > pr(5L) && pr(3L) > pr(6L),
      s"seed triangle must dominate its mirror: $pr")
    assert(pr(1L) == pr.values.max, "the seed itself scores highest")
    val none = Traversals.personalizedPageRank(tri.toDF("src", "dst"),
      Seq.empty[Long].toDF("id"), iters = 3)
      .as[(Long, Double)].collect()
    assert(none.length == 6 && none.forall(_._2 == 0.0),
      "no seeds -> zero scores for every vertex")
  }

  test("edges are undirected and duplicates/self-loops are harmless") {
    val got = hops(Seq((2L, 1L), (2L, 1L), (2L, 2L), (3L, 2L)), Seq(1L))
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("maxHops caps the expansion") {
    val got = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), maxHops = 2)
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("local-min seeds are the vertices with no smaller neighbor") {
    val seeds = Traversals.localMinSeeds(
      Seq((1L, 2L), (2L, 3L), (6L, 5L)).toDF("src", "dst"))
      .as[Long].collect().toSet
    assert(seeds == Set(1L, 5L))
  }

  test("live checkpoints are exactly the result's layers, nothing superseded") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val got = hops((0L until 40L).map(i => (i, i + 1)), Seq(0L), maxHops = 64)
    assert(got.size == 41 && got(40L) == 40)
    val leaked = sc.getPersistentRDDs.keySet -- before
    // Layered form (round 15): each BFS level is checkpointed ONCE and
    // backs the result directly — total checkpoint bytes are O(V), not
    // the old form's O(V·diameter) of superseded cumulative snapshots.
    // What may live afterwards is exactly one checkpoint per level of
    // the result (41 here); the symmetrized edge view and the terminal
    // empty layer must have been released.
    val levels = got.values.max + 1
    assert(leaked.size <= levels,
      s"more live checkpoints (${leaked.size}) than result levels " +
        s"($levels) — a superseded or terminal frame leaked: $leaked")
  }

  test("triangles of K4 plus a pendant edge") {
    // K4 on {1,2,3,4}: every vertex is in C(3,2)=3 triangles; 5 dangles
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = Traversals.triangles((k4 :+ (4L, 5L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("triangle-free graph reports zero everywhere") {
    val got = Traversals.triangles(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("pageRank matches a driver-side power iteration to float tolerance") {
    // star + chain + dangling sink: 1→2, 3→2, 2→4, 4 dangling
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L))
    val got = Traversals.pageRank(edges.toDF("src", "dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    // reference: same fixed-point arithmetic on plain arrays
    val ids = Seq(1L, 2L, 3L, 4L)
    val out = Map(1L -> Seq(2L), 3L -> Seq(2L), 2L -> Seq(4L))
    var pr = ids.map(_ -> 1.0 / 4).toMap
    for (_ <- 1 to 5) {
      val dang = ids.filterNot(out.contains).map(pr).sum
      pr = ids.map { v =>
        val in = out.collect {
          case (u, ts) if ts.contains(v) => pr(u) / ts.size
        }.sum
        v -> ((1.0 - 0.85) / 4 + 0.85 * (in + dang / 4))
      }.toMap
    }
    assert(got.keySet == pr.keySet)
    ids.foreach(v => assert(math.abs(got(v) - pr(v)) < 1e-12, s"vertex $v"))
    // more in-links → higher rank; mass conserved
    assert(got(2L) > got(1L) && got(4L) > got(1L))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank releases per-round checkpoints and handles empty graphs") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val r = Traversals.pageRank(
      (0L until 50L).map(i => (i, (i + 1) % 50)).toDF("src", "dst"), iters = 4)
    assert(r.count() == 50)
    val leaked = sc.getPersistentRDDs.keySet -- before
    // only the final ranks checkpoint (backing the result) may live; the
    // 4 superseded rank vectors, verts, and the edge inputs must not
    assert(leaked.size <= 1, s"checkpoints leaked: $leaked")
    assert(Traversals.pageRank(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("label propagation converges each clique to its minimum label") {
    // two triangles; round-by-round: min-tiebreak pulls every triangle
    // member onto the smallest id within 3 synchronous rounds
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val got = Traversals.labelPropagation(tri.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("kCore keeps the K4 and peels the tail") {
    // K4 plus a 2-link tail: tail peels in one round, K4 (all degree 3)
    // is the stable 3-core
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = Traversals.kCore(
        (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a path has no 2-core: ends peel one link per round until empty
    val path = (1L until 5L).map(i => (i, i + 1))
    assert(Traversals.kCore(path.toDF("src", "dst"), k = 2).count() == 0)
  }

  test("degree-ordered count matches the naive a<b<c three-way join") {
    // deterministic pseudo-random graph, heavy-tailed enough to exercise
    // the orientation
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val fast = Traversals.triangles(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val ce = edges.map { case (a, b) => (a min b, a max b) }.distinct
    val ceSet = ce.toSet
    val naive = ce.flatMap { case (a, b) =>
      ce.collect { case (`b`, c) if ceSet((a, c)) => Seq(a, b, c) }.flatten
    }.groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
    val verts = ce.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = verts.map(v => v -> naive.getOrElse(v, 0L)).toMap
    assert(fast == expected)
  }

  test("linkPredict matches a brute common-neighbor/RA enumeration") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val got = Traversals.linkPredict(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, cn, ra) => (a, b) -> ((cn, ra)) }.toMap

    val ce = edges.map { case (a, b) => (a min b, a max b) }.distinct
    val adj = (ce ++ ce.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
    val ceSet = ce.toSet
    val vs = adj.keys.toSeq.sorted
    val expected = (for {
      a <- vs; b <- vs if a < b && !ceSet((a, b))
      common = adj(a).intersect(adj(b)) if common.nonEmpty
    } yield (a, b) -> ((common.size.toLong,
      common.toSeq.map(w => 1000000L / deg(w)).sum))).toMap
    assert(got == expected)
  }

  test("linkPredict excludes adjacent pairs and handles the empty graph") {
    // triangle: every 2-hop pair is already an edge -> nothing predicted
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(Traversals.linkPredict(tri.toDF("src", "dst")).count() == 0)
    assert(Traversals.linkPredict(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("deterministicWalks follows the hash argmin; sinks stay put") {
    import graft.functions.PolyHash
    // 1 and 2 each have two out-choices; 3 is a sink; self-loop dropped
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 3L))
    val adj = edges.filter(e => e._1 != e._2).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).sorted }
    def next(v: Long, t: Int): Long = adj.get(v) match {
      case Some(ns) => ns.minBy(w => (PolyHash.hash(s"$v:$w:$t"), w))
      case None => v
    }
    val steps = 3
    val expected = (for {
      seed <- Seq(1L, 3L)
      path = Iterator.iterate((seed, 0)) { case (v, t) =>
        (next(v, t + 1), t + 1) }.take(steps + 1).toSeq
      (id, st) <- path
    } yield (seed, st, id)).toSet
    val got = Traversals.deterministicWalks(edges.toDF("src", "dst"),
        Seq(1L, 3L).toDF("id"), steps)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expected, s"got $got expected $expected")
    // seed 3 has no non-self out-edge: its walk never moves
    assert((0 to steps).forall(t => got((3L, t, 3L))))
  }

  test("seededSigma counts shortest paths layer by layer") {
    // diamond 1-{2,3}-4 plus a tail 4-5: two shortest paths 1→4, both
    // extending to 5; revisits and longer paths must not count
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Traversals.seededSigma(edges, Seq(1L).toDF("id"), maxHops = 3)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0, 1L), (1L, 2L, 1, 1L), (1L, 3L, 1, 1L),
      (1L, 4L, 2, 2L), (1L, 5L, 3, 2L)))
    // two seeds expand in the same fixpoint, counts stay per-seed
    val two = Traversals.seededSigma(edges, Seq(1L, 5L).toDF("id"),
        maxHops = 2)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(two.contains((5L, 4L, 1, 1L)) && two.contains((5L, 2L, 2, 1L))
      && two.contains((1L, 4L, 2, 2L)) && !two.exists(r =>
        r._1 == 5L && r._2 == 1L)) // 1 is 3 hops from 5 — outside radius
  }

  test("kTruss keeps the clique, drops weak triangles, and cascades") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) plus a lone triangle
    // {5,6,7} (every edge in 1)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val lone = Seq((5L, 6L), (5L, 7L), (6L, 7L))
    val edges = (k4 ++ lone).toDF("src", "dst")
    // k=3: support >= 1 — everything survives, supports as constructed
    val t3 = Traversals.kTruss(edges, k = 3, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(t3 == (k4.map { case (a, b) => (a, b, 2L) } ++
      lone.map { case (a, b) => (a, b, 1L) }).toSet)
    // k=4: support >= 2 — only the K4 edges survive, and their support
    // within the surviving set is still 2
    val t4 = Traversals.kTruss(edges, k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(t4 == k4.map { case (a, b) => (a, b, 2L) }.toSet)
    // cascade: two triangles sharing edge (2,3) — that edge has support
    // 2 in round 1, but peeling its support-1 sides leaves it
    // triangle-free, so round 2 drops it too
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    assert(Traversals.kTruss(chain, k = 4, rounds = 2).count() == 0L)
    // ...and with one round the cascade hasn't happened yet
    assert(Traversals.kTruss(chain, k = 4, rounds = 1)
      .as[(Long, Long, Long)].collect().toSet == Set((2L, 3L, 2L)))
  }

  test("hits: hand-computed alternating walks on a directed star-chain") {
    // 1→2, 1→3, 4→2: vertex 2 is the authority (two in-hubs), 1 the hub
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L)).toDF("src", "dst")
    val got = Traversals.hits(edges, iters = 1)
      .select("id", "auth_walks", "hub_walks")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // iter 1: a = in-degree (h0 = 1); h = Σ a over out-neighbors
    assert(got == Map(
      1L -> (0L, 3L), // a=0 (no in), h = a(2)+a(3) = 2+1
      2L -> (2L, 0L),
      3L -> (1L, 0L),
      4L -> (0L, 2L))) // h = a(2) = 2
    // two rounds stay exact integers and keep sinks/sources at 0
    val r2 = Traversals.hits(edges, iters = 2)
      .select("id", "auth_walks", "hub_walks")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // a2 = Σ_in h1: a2(2) = h1(1)+h1(4) = 5, a2(3) = h1(1) = 3
    // h2 = Σ_out a2: h2(1) = 5+3 = 8, h2(4) = 5
    assert(r2 == Map(1L -> (0L, 8L), 2L -> (5L, 0L), 3L -> (3L, 0L),
      4L -> (0L, 5L)))
  }

  test("deterministicWalks is partitioning-invariant") {
    val edges = (1L to 40L).flatMap(v =>
      Seq((v, v % 40 + 1), (v, (v * 7) % 40 + 1), (v, (v * 13) % 40 + 1)))
    val seeds = Seq(1L, 8L, 23L)
    val a = Traversals.deterministicWalks(
      edges.toDF("src", "dst").repartition(1), seeds.toDF("id"), 5)
      .as[(Long, Int, Long)].collect().toSet
    val b = Traversals.deterministicWalks(
      edges.toDF("src", "dst").repartition(7), seeds.toDF("id"), 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b && a.size == seeds.size * 6)
  }
}
