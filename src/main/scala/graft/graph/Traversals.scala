package graft.graph

import graft.core.LineageCut
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-style graph traversals over edge DataFrames — the
  * cluster-expansion semantics the reference prototyped and abandoned
  * (`.ipynb_checkpoints/DBSCAN-checkpoint.ipynb` cell 6: a BFS queue walk
  * over a driver-global `visited` set that crashes with
  * `UnboundLocalError`; SURVEY §2.7 G5), re-done as distributed
  * fixpoints: the frontier is a DataFrame, each round is one keyed
  * equi-join + distinct + anti-join, and the visited set never touches
  * the driver.
  */
object Traversals {

  /** Both-direction simple view of an edge list (self-loops dropped,
    * duplicates collapsed). */
  private[graft] def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Seed set for [[bfsHops]]: vertices that are a local minimum of the
    * undirected graph (every neighbor id is larger). Each component's
    * global minimum always qualifies, so every vertex is within finite
    * hops of a seed. One map-side-combined aggregation. */
  def localMinSeeds(edges: DataFrame): DataFrame =
    symmetrize(edges).groupBy("src").agg(min("dst").as("mn"))
      .where(col("mn") > col("src"))
      .select(col("src").as("id"))

  /** Multi-source BFS: minimum hop count from any vertex of `sources` to
    * every reachable vertex, treating `edges` as undirected.
    *
    * Each round schedules ONE job, and — round 15 — checkpoints ONLY the
    * round's NEW LAYER, not the cumulative visited set: the layer (current
    * frontier joined to the adjacency, deduped, anti-joined against the
    * union of all previous layers) is lazily checkpointed and its `count`
    * both materializes it and detects the fixpoint (empty layer → done).
    * The old form union-rechecked the whole visited set per round —
    * O(V·diameter) checkpoint bytes over the run — while the layers sum
    * to O(V) exactly once; the dedup anti-join reads only the previous
    * TWO layers (BFS level property). Every per-round
    * shuffle is keyed by vertex id — frontier·adjacency join, distinct,
    * anti-join — so rounds scale with the frontier, not the graph, and
    * nothing collects to the driver.
    *
    * @return (id, hops) for every vertex reachable within `maxHops`;
    *         `hops` is Int. Sources themselves report 0.
    */
  def bfsHops(edges: DataFrame, sources: DataFrame, maxHops: Int = 32): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint(eager = false)
    val out = bfsHopsSym(sym, sources, maxHops)
    LineageCut.release(sym)
    out
  }

  /** [[bfsHops]] over an ALREADY symmetrized simple edge view (two
    * directed rows per undirected edge, self-loops dropped) — callers
    * that sweep the same graph repeatedly (graph_diameter's double
    * sweep) symmetrize + checkpoint once and share it; the caller owns
    * `sym`'s lifecycle. */
  private[graft] def bfsHopsSym(sym: DataFrame, sources: DataFrame,
                                maxHops: Int): DataFrame = {
    var layer = sources.select(col("id").cast("long").as("id")).distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint(eager = false)
    var layerCount = layer.count()
    var layers = List(layer)
    // BFS level property (round 15): a candidate expanded from layer k−1
    // sits at distance k−2, k−1 or k, so the dedup anti-join only needs
    // the previous TWO layers, not the whole visited union — the
    // per-round plan stays constant-size instead of growing with the
    // round number (the growth was measured as a real per-round analyzer
    // + scan cost on long-diameter graphs).
    var prev: DataFrame = null
    var hop = 0
    while (layerCount > 0 && hop < maxHops) {
      hop += 1
      val anti = if (prev == null) layer.select(col("id"))
        else prev.select(col("id")).union(layer.select(col("id")))
      val next = layer
        .join(sym, layer("id") === sym("src"))
        .select(sym("dst").as("id"))
        .distinct()
        .join(anti, Seq("id"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint(eager = false)
      layerCount = next.count() // materializes ONLY the new layer
      if (layerCount > 0) {
        layers ::= next
      } else {
        // the terminal empty layer is not part of the result — release
        // its (empty) checkpoint instead of stranding it until GC
        LineageCut.release(next)
      }
      prev = layer
      layer = next
    }
    layers.reduce(_ union _)
      .select(col("id"), col("hops").cast("int").as("hops"))
  }

  /** Per-seed BFS distances: like [[bfsHops]] but the visited state is
    * keyed by (seed, id), so every seed's frontier expands in the SAME
    * per-round job — k seeds cost k× the state, not k× the rounds.
    * Shuffles stay keyed ((seed, id) distinct/anti-join, id-keyed
    * adjacency join); nothing collects to the driver.
    *
    * @return (seed, id, hops) for every vertex within `maxHops` of a
    *         seed; the seed itself reports 0.
    */
  def seededHops(edges: DataFrame, seeds: DataFrame,
                 maxHops: Int = 32): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint(eager = false)

    // layered form (round 15, as in [[bfsHopsSym]]): checkpoint + count
    // only each round's new (seed, id) layer; the visited set for the
    // anti-join is the union of the materialized layers
    var layer = seeds.select(col("id").cast("long").as("seed"))
      .distinct()
      .withColumn("id", col("seed"))
      .withColumn("hops", lit(0))
      .localCheckpoint(eager = false)
    var layerCount = layer.count()
    var layers = List(layer)
    // two-layer anti-join (round 15): per seed, the BFS level property
    // bounds a candidate's distance to k−2..k, so only the previous two
    // layers can collide — constant-size per-round plan (see bfsHopsSym)
    var prev: DataFrame = null
    var hop = 0
    while (layerCount > 0 && hop < maxHops) {
      hop += 1
      val anti = if (prev == null) layer.select(col("seed"), col("id"))
        else prev.select(col("seed"), col("id"))
          .union(layer.select(col("seed"), col("id")))
      val next = layer
        .join(sym, layer("id") === sym("src"))
        .select(col("seed"), sym("dst").as("id"))
        .distinct()
        .join(anti, Seq("seed", "id"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint(eager = false)
      layerCount = next.count()
      if (layerCount > 0) {
        layers ::= next
      } else {
        LineageCut.release(next) // terminal empty layer — not in the result
      }
      prev = layer
      layer = next
    }
    LineageCut.release(sym)
    layers.reduce(_ union _)
  }

  /** Per-seed shortest-path COUNTS — Brandes' σ recursion (Brandes 2001,
    * eq. σ_sv = Σ_{u∈pred(v)} σ_su) layered over the [[seededHops]]
    * frontier fixpoint: layer d's count for (seed, v) is the sum of
    * layer d−1 counts over v's neighbors, and the (seed, id) anti-join
    * against the visited set is exactly the "predecessors only" BFS
    * property. Pure Long arithmetic — path counts are integers, so the
    * result is order-independent and oracle-exact. State is
    * (seed, id, hops, sigma) — k·|ball(maxHops)| bounded like
    * seededHops; every shuffle keyed ((seed, id) aggregation/anti-join,
    * id-keyed adjacency join).
    *
    * @return (seed, id, hops, sigma) for every vertex within `maxHops`
    *         of a seed; the seed itself reports (0, 1).
    */
  def seededSigma(edges: DataFrame, seeds: DataFrame,
                  maxHops: Int): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint(eager = false)
    // layered form (round 15, as in [[bfsHopsSym]]): checkpoint + count
    // only each round's new σ layer, and stop early once a layer comes
    // back empty — σ_sv sums only over the previous BFS layer, so the
    // per-layer recursion is unchanged by the restructuring
    var layer = seeds.select(col("id").cast("long").as("seed"))
      .distinct()
      .withColumn("id", col("seed"))
      .withColumn("hops", lit(0))
      .withColumn("sigma", lit(1L))
      .localCheckpoint(eager = false)
    var layerCount = layer.count()
    var layers = List(layer)
    // two-layer anti-join — see seededHops; σ sums only over the previous
    // layer, so the recursion is untouched by the narrower dedup
    var prev: DataFrame = null
    var hop = 0
    while (layerCount > 0 && hop < maxHops) {
      hop += 1
      val anti = if (prev == null) layer.select(col("seed"), col("id"))
        else prev.select(col("seed"), col("id"))
          .union(layer.select(col("seed"), col("id")))
      val next = layer
        .join(sym, layer("id") === sym("src"))
        .groupBy(col("seed"), sym("dst").as("id"))
        .agg(sum("sigma").as("sigma"))
        .join(anti, Seq("seed", "id"), "left_anti")
        .withColumn("hops", lit(hop))
        .select("seed", "id", "hops", "sigma")
        .localCheckpoint(eager = false)
      layerCount = next.count()
      if (layerCount > 0) {
        layers ::= next
      } else {
        LineageCut.release(next) // terminal empty layer — not in the result
      }
      prev = layer
      layer = next
    }
    LineageCut.release(sym)
    layers.reduce(_ union _)
  }

  /** Harmonic centrality of every vertex with respect to a seed set
    * (Boldi & Vigna 2014's centrality, restricted to sampled sources —
    * the standard estimator at graph scale): h(v) = Σ_seeds 1/d(seed, v),
    * kept EXACT as integer ppm (Σ 1000000 div hops over hops ≥ 1).
    * One [[seededHops]] fixpoint + one map-side-combined groupBy.
    *
    * @return (id, n_seeds_reached, h_ppm) for vertices reachable from
    *         at least one seed in 1..maxHops hops.
    */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
                         maxHops: Int = 32): DataFrame =
    seededHops(edges, seeds, maxHops)
      .where(col("hops") > 0)
      .groupBy("id")
      .agg(count(lit(1)).as("n_seeds_reached"),
        sum(expr("1000000 div CAST(hops AS BIGINT)")).as("h_ppm"))

  /** Fixed-iteration PageRank over the DIRECTED simple view of `edges`
    * (self-loops dropped, duplicate edges collapsed), with uniform
    * teleport and dangling mass redistributed uniformly — the standard
    * power iteration, run a FIXED `iters` rounds so the result is exactly
    * replayable (the oracle unrolls the same rounds in SQL).
    *
    * Per round: one keyed join of the contribution edges with the rank
    * vector + one map-side-combined groupBy(dst) sum; the dangling mass
    * is a 1-row aggregate attached by broadcast crossJoin, so a round is
    * ONE job (the lazy checkpoint's materializing count) and nothing
    * collects to the driver. Superseded rank checkpoints are released
    * eagerly. Shuffles are keyed by vertex id throughout — at 1000
    * executors each round is a pair of hash exchanges of the rank
    * vector, the same shape GraphX's Pregel would shuffle, minus the
    * vertex-program overhead.
    *
    * @return (id, pr) for every vertex of the graph; `pr` is unrounded
    *         (callers round for cross-engine comparison).
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    val ce = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    val verts = ce.select(col("src").as("id"))
      .union(ce.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = false)
    val n = verts.count() // materializes ce + verts
    if (n == 0) return verts.withColumn("pr", lit(0.0))

    val outdeg = ce.groupBy("src").agg(count(lit(1)).cast("double").as("c"))
    val contribEdges = ce.join(outdeg, "src").localCheckpoint(eager = false)
    contribEdges.count()

    // Round 15: the dangling flag rides ON the rank vector (ho = has an
    // out-edge) instead of living in a separate table — the per-round
    // dangling mass becomes a filter+sum over the vector the round reads
    // anyway, and the per-round left join reads the previous vector (which
    // covers every vertex) instead of a third verts table. Same
    // arithmetic, two fewer per-round join inputs.
    var ranks = verts
      .join(outdeg.select(col("src").as("id"), lit(1).as("ho")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("ho"), lit(0)).as("ho"),
        lit(1.0 / n).as("pr"))
      .localCheckpoint(eager = false)
    ranks.count() // materialized while its ce-rooted lineage is still live
    LineageCut.release(ce)
    var it = 0
    while (it < iters) {
      val dang = ranks.where(col("ho") === 0)
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
      val contrib = contribEdges
        .join(ranks.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), (col("pr") / col("c")).as("w"))
        .groupBy("id").agg(sum("w").as("contrib"))
      val next = ranks.select(col("id"), col("ho"))
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"), col("ho"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / n)).as("pr"))
        .localCheckpoint(eager = false)
      next.count() // materialize before dropping the parent
      LineageCut.release(ranks)
      ranks = next
      it += 1
    }
    LineageCut.release(contribEdges)
    // the final ranks checkpoint was materialized by the last round's
    // count, so its verts parent is releasable — but only if a round
    // actually ran (at iters=0 the returned frame still reads verts)
    if (iters > 0) LineageCut.release(verts)
    ranks.select(col("id"), col("pr"))
  }

  /** Personalized PageRank / random walk with restart (Jeh & Widom
    * 2003): [[pageRank]] with the uniform teleport replaced by a seed
    * vector — (1−d)/|S| lands on seed vertices only, and dangling mass
    * restarts at the seeds instead of everywhere. The result scores
    * every vertex by its proximity to the seed set, the graph-side
    * relevance primitive (seed-expansion data selection, related-item
    * retrieval). Identical plan shape and checkpoint discipline to
    * [[pageRank]]: one contribution join + one map-side-combined sum
    * per round, the dangling mass a 1-row broadcast, seed membership a
    * flag column on the vertex table (no per-round seed join).
    *
    * @param seeds one `id` column; intersected with the graph's vertex
    *              set (ids outside the graph are ignored).
    * @return (id, pr) for every vertex; `pr` unrounded.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 5,
                           damping: Double = 0.85): DataFrame = {
    val ce = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    val verts = ce.select(col("src").as("id"))
      .union(ce.select(col("dst").as("id"))).distinct()
    val sflag = verts
      .join(seeds.select(col("id").cast("long").as("id")).distinct()
        .withColumn("s", lit(1)), Seq("id"), "left")
      .select(col("id"), coalesce(col("s"), lit(0)).as("s"))
      .localCheckpoint(eager = false)
    val ns = sflag.where(col("s") === 1).count() // materializes ce + sflag
    if (ns == 0) {
      LineageCut.release(ce)
      return sflag.select(col("id"), lit(0.0).as("pr"))
    }

    val outdeg = ce.groupBy("src").agg(count(lit(1)).cast("double").as("c"))
    val contribEdges = ce.join(outdeg, "src").localCheckpoint(eager = false)
    contribEdges.count()

    // seed flag AND dangling flag ride on the rank vector (see pageRank):
    // the per-round dangling mass is a filter+sum, the per-round left join
    // reads the previous vector — no separate dangling/sflag join inputs
    val base = when(col("s") === 1, lit((1.0 - damping) / ns))
      .otherwise(lit(0.0))
    var ranks = sflag
      .join(outdeg.select(col("src").as("id"), lit(1).as("ho")),
        Seq("id"), "left")
      .select(col("id"), col("s"), coalesce(col("ho"), lit(0)).as("ho"),
        when(col("s") === 1, lit(1.0 / ns)).otherwise(lit(0.0)).as("pr"))
      .localCheckpoint(eager = false)
    ranks.count() // materialized while its ce-rooted lineage is still live
    LineageCut.release(ce)
    var it = 0
    while (it < iters) {
      val dang = ranks.where(col("ho") === 0)
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
      val contrib = contribEdges
        .join(ranks.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), (col("pr") / col("c")).as("w"))
        .groupBy("id").agg(sum("w").as("contrib"))
      val next = ranks.select(col("id"), col("s"), col("ho"))
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"), col("s"), col("ho"),
          (base + lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
            when(col("s") === 1, col("dm") / ns).otherwise(lit(0.0))))
            .as("pr"))
        .localCheckpoint(eager = false)
      next.count()
      LineageCut.release(ranks)
      ranks = next
      it += 1
    }
    LineageCut.release(contribEdges)
    if (iters > 0) LineageCut.release(sflag)
    ranks.select(col("id"), col("pr"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007), the
    * deterministic variant: every vertex starts labeled with its own id;
    * each round it adopts the label most frequent among its neighbors,
    * ties to the SMALLEST label, all vertices updating simultaneously.
    * A FIXED `iters` rounds keeps the result exactly replayable (the
    * oracle unrolls the rounds); arithmetic is pure integer counting, so
    * there is no float drift at all. Densely intra-connected regions
    * converge onto one label — community detection at ε-graph scale.
    *
    * Per round: one keyed join delivering neighbor labels, one
    * map-side-combined (vertex, label) count, one min-struct argmax per
    * vertex (count desc, label asc — NO per-key window), checkpointed
    * with eager release. Returns (id, label).
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint(eager = false)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
      .localCheckpoint(eager = false)
    labels.count()
    var it = 0
    while (it < iters) {
      val msgs = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab"))
      val next = msgs.groupBy("id", "lab").agg(count(lit(1)).as("cnt"))
        .groupBy("id")
        .agg(min(struct((-col("cnt")).as("nc"), col("lab").as("lab")))
          .as("top"))
        .select(col("id"), col("top.lab").as("lab"))
        .localCheckpoint(eager = false)
      next.count()
      LineageCut.release(labels)
      labels = next
      it += 1
    }
    LineageCut.release(sym)
    labels.select(col("id"), col("lab").as("label"))
  }

  /** Fixed-round k-core peeling: `rounds` iterations of "drop every
    * vertex with degree < k, then recompute degrees", over the
    * undirected simple view. The contract is the ROUND-BOUNDED state —
    * chain-shaped graphs peel one link per round, so full convergence
    * can take O(n) rounds; a production run loops to fixpoint (the loop
    * body is this round), while fixed rounds keep the gate exactly
    * replayable — the oracle unrolls them. Pure integer arithmetic.
    *
    * Per round: one map-side-combined degree count + two semi-joins
    * restricting the edge list — all keyed, nothing collects.
    *
    * @return (id, deg): vertices with ≥1 surviving edge after the final
    *         peel, with their degree in the surviving subgraph.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    var e = symmetrize(edges).localCheckpoint(eager = false)
    e.count()
    var r = 0
    while (r < rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("dg"))
        .where(col("dg") >= k).select(col("src").as("id"))
      val next = e
        .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = false)
      next.count()
      LineageCut.release(e)
      e = next
      r += 1
    }
    e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
  }

  /** Per-vertex triangle counts, treating `edges` as undirected (simple
    * graph: self-loops dropped, duplicates collapsed).
    *
    * Degree-ordered orientation (each edge directed toward the higher
    * (degree, id) endpoint) bounds every vertex's out-degree by O(√m), so
    * the wedge join enumerates each triangle exactly once from its
    * lowest-ordered corner and the candidate stream stays near-linear in
    * the triangle count even on skewed degree distributions — the
    * standard MapReduce triangle scheme (Suri & Vassilvitskii, WWW'11).
    * All three joins are keyed equi-joins; identical subplans (the
    * oriented edge list appears three times) collapse via Spark's
    * exchange reuse, so nothing needs a persist.
    *
    * @return (id, n_tri) for every vertex of the graph, 0 included.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val canon = canonEdges(edges)
    val deg = canon.select(col("a").as("id")).union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val tri = enumTriangles(canon, deg)
    val perVertex = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Canonical undirected simple edge view: (a, b) with a < b, self-loops
    * dropped, duplicates collapsed. */
  private def canonEdges(edges: DataFrame): DataFrame = edges
    .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    .where(col("src") =!= col("dst"))
    .select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .distinct()

  /** Each triangle of the canonical edge set exactly once as (u, v, w) —
    * the degree-ordered wedge scheme of [[triangles]], factored so
    * [[kTruss]]'s per-round support counts reuse it. `deg` must be the
    * degree table of `canon`'s vertices. */
  private def enumTriangles(canon: DataFrame, deg: DataFrame): DataFrame =
    wedgeClose(orientByDegree(canon, deg))

  /** (u, v) with ord(u) < ord(v) under the (deg, id) order, carrying v's
    * order key for the wedge inequality in [[wedgeClose]]. */
  private def orientByDegree(canon: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
  }

  /** Each triangle of the degree-oriented edge view exactly once.
    * Wedges (u, v, w) with ord(v) < ord(w): both closing edges of a
    * triangle leave the wedge tips in orientation order, so a single
    * (v, w) equi-join detects closure without double counting. */
  private def wedgeClose(oriented: DataFrame): DataFrame = {
    val o1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val o2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = o1.join(o2, "u")
      .where(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("u"), col("x").as("v"), col("y").as("w"))
    wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
  }

  /** Round-bounded k-truss peel (Cohen 2008; Wang & Cheng, VLDB'12): keep
    * the edges whose triangle support — common neighbors WITHIN the
    * surviving edge set — is at least k−2, recomputing support after each
    * peel. `rounds` bounds the fixpoint exactly like [[kCore]]'s
    * round-bounded contract; the k-truss is the fixpoint of this map, and
    * each round's edge set only shrinks.
    *
    * Scale shape: every round is one degree-ordered triangle enumeration
    * over the CURRENT edge set (each triangle once, candidate stream
    * near-linear in the triangle count — [[triangles]]' plan), one
    * edge-keyed support aggregation, and the peel filter. The edge set is
    * checkpointed per round so the next enumeration reads a materialized
    * input instead of re-deriving the whole peel history; superseded
    * blocks are released eagerly. Nothing collects to the driver.
    *
    * @return (a, b, sup) for the edges that survive `rounds` peels; `sup`
    *         is each survivor's support on the edge set that ENTERED the
    *         final peel (the value the last filter tested).
    */
  def kTruss(edges: DataFrame, k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1, s"k-truss needs rounds >= 1, got $rounds")
    var e = canonEdges(edges).localCheckpoint(eager = false)
    e.count()
    var r = 0
    var lastSup: DataFrame = null
    while (r < rounds) {
      val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tri = enumTriangles(e, deg)
      // a triangle supports each of its three edges; corners come out of
      // the wedge join in orientation (deg, id) order, so re-canonicalize
      // each side pair by id before the edge-keyed count
      val sup = tri.select(explode(array(
          struct(least(col("u"), col("v")).as("a"),
            greatest(col("u"), col("v")).as("b")),
          struct(least(col("u"), col("w")).as("a"),
            greatest(col("u"), col("w")).as("b")),
          struct(least(col("v"), col("w")).as("a"),
            greatest(col("v"), col("w")).as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
        .where(col("sup") >= k - 2)
        .localCheckpoint(eager = false)
      sup.count()
      LineageCut.release(e)
      lastSup = sup
      e = sup.select(col("a"), col("b"))
      r += 1
    }
    lastSup
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg, CIKM'03)
    * over an undirected simple view of `edges`: for every NON-adjacent
    * vertex pair at distance 2, the common-neighbor count `cn` and the
    * resource-allocation index (Zhou, Lü & Zhang, EPJ B 2009)
    * Σ_w 1/deg(w) over the shared neighbors w — the curation-side "these
    * two docs share context" signal. RA is kept EXACT as integer ppm
    * (`1000000 div deg(w)` per wedge, summed as longs), so the per-pair
    * score is order-independent — no float ever exists and the result
    * hashes identically in any engine.
    *
    * Plan: wedges enumerate per center w (two passes over w's adjacency,
    * tips ordered a < b so each pair appears once per shared neighbor),
    * then a pair-keyed aggregation and a keyed left-anti join against
    * the existing edge set. Per-center fan-out is C(deg(w), 2) — bounded
    * on an ε-graph (ball-packing bounds the degree); on a power-law
    * graph the standard mitigation is capping or sampling hub centers
    * before the wedge join (their RA terms are the smallest), which
    * callers can do by filtering `edges` — not built in because every
    * gate graph is degree-bounded.
    */
  def linkPredict(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sym = canon.select(col("a").as("id"), col("b").as("nbr"))
      .union(canon.select(col("b").as("id"), col("a").as("nbr")))
    val deg = sym.groupBy("id").agg(count(lit(1)).as("deg"))
    val adj = sym.join(deg, "id")
    val w1 = adj.select(col("id").as("w"), col("nbr").as("a"), col("deg"))
    val w2 = adj.select(col("id").as("w"), col("nbr").as("b"))
    val scored = w1.join(w2, "w")
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000L div deg")).as("ra_ppm"))
    scored.join(canon, Seq("a", "b"), "left_anti")
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("cn"), col("ra_ppm"))
  }

  /** Local clustering coefficient per vertex (Watts & Strogatz 1998):
    * 2·tri(v) / (deg(v)·(deg(v)−1)) over the undirected simple view of
    * `edges`, kept EXACT as integer ppm — `2000000·tri div deg·(deg−1)`
    * in Long arithmetic, 0 for deg < 2 — so the result is
    * order-independent and hashes identically in any engine.
    *
    * Plan: per-vertex triangle counts from [[triangles]] (the
    * degree-ordered wedge join — each triangle counted once), plus one
    * map-side-combined degree aggregate, joined on vertex id. Both
    * shuffles are keyed; nothing all-pairs.
    *
    * @return (id, deg, n_tri, coeff_ppm) per vertex of the simple graph.
    */
  def clusteringCoeff(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    deg.join(triangles(edges), Seq("id"))
      .select(col("id"), col("deg"), col("n_tri"),
        when(col("deg") < 2, lit(0L))
          .otherwise(expr("(2000000L * n_tri) div (deg * (deg - 1L))"))
          .as("coeff_ppm"))
  }

  /** Eigenvector centrality by power iteration on the undirected graph,
    * kept EXACT: starting from the all-ones vector, `iters` rounds of
    * x ← A·x stay in Long arithmetic (x_k(v) = number of k-walks ending
    * at v — Bonacich 1972's centrality before normalization), so unlike
    * [[pageRank]] there is no float in the iteration at all. The single
    * normalization (walks / max-walks) happens once at the end — one
    * IEEE division both engines replay bit-equally.
    *
    * Plan: `iters` rounds of one edge-keyed equi-join + one
    * map-side-combined sum each; the walk-count frame stays O(|V|)
    * between rounds. Long headroom: walks grow like deg^iters — at
    * iters=3 a degree-10^6 hub graph still fits (10^18 < 2^63); larger
    * products should scale the start vector down or switch to the float
    * [[pageRank]] discipline.
    *
    * @return (id, walks, score) for every vertex, walks exact, score the
    *         max-normalized double (callers round for gates).
    */
  def eigenCentrality(edges: DataFrame, iters: Int = 3): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint(eager = false)
    var x = sym.select(col("src").as("id")).distinct()
      .withColumn("w", lit(1L))
    var it = 0
    while (it < iters) {
      // every vertex of sym has >= 1 neighbor, so the groupBy re-emits
      // the full vertex set each round — no left join needed
      x = sym.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum("w").as("w"))
      it += 1
    }
    val mx = x.agg(max("w").as("mx"))
    x.crossJoin(broadcast(mx))
      .select(col("id"), col("w").as("walks"),
        (col("w").cast("double") / col("mx").cast("double")).as("score"))
  }

  /** Deterministic walk corpus over a DIRECTED edge list — the DeepWalk/
    * node2vec corpus-generation step (Perozzi et al. KDD'14, Grover &
    * Leskovec KDD'16) with the random draw replaced by a hash argmin, so
    * the corpus is bit-reproducible across runs, partitionings, and
    * engines: at step t the walk at vertex v moves to
    * argmin_{(v,w)∈E, v≠w} (poly_hash("v:w:t"), w) and stays at v when v
    * has no out-edge (border vertices of the ε-graph). Including t in the
    * hash makes revisits take fresh pseudo-draws instead of looping on
    * one frozen choice.
    *
    * Plan: per step, ONE vertex-keyed equi-join (frontier ⋈ out-edges —
    * the frontier is |seeds| rows and broadcastable) and ONE map-side-
    * combined min(struct(h, dst)) per walk; the stay branch is a keyed
    * anti-join against the out-vertex set. No windows, nothing collects
    * to the driver; state is O(|seeds|) between steps, so the cost is
    * `steps` frontier-sized jobs regardless of graph size.
    *
    * @return (walk, step, id) — walk = seed id, step ∈ [0, steps].
    */
  def deterministicWalks(edges: DataFrame, seeds: DataFrame,
                         steps: Int): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .localCheckpoint(eager = false)
    val outVerts = e.select("src").distinct().localCheckpoint(eager = false)

    var cur = seeds.select(col("id").cast("long").as("walk"),
      col("id").cast("long").as("id"))
    val legs = Seq.newBuilder[DataFrame]
    legs += cur.select(col("walk"), lit(0).as("step"), col("id"))
    var t = 1
    while (t <= steps) {
      // Round 15: each step references the previous state TWICE (moved +
      // stayed), so without a cut the final union's logical tree holds
      // O(2^steps) copies of the base subtree — real analyzer cost even
      // at steps=4. A lazy checkpoint makes each step a LogicalRDD leaf;
      // the caller's single action materializes the chain (no extra
      // jobs), and the blocks are O(|seeds|) per step, like BFS layers.
      // (The checkpoint also hides the step joins from the GATE's final
      // plan, so PlanHygieneSpec pins the broadcast shape on walkStep
      // itself.)
      cur = walkStep(cur, e, outVerts, t).localCheckpoint(eager = false)
      legs += cur.select(col("walk"), lit(t).as("step"), col("id"))
      t += 1
    }
    legs.result().reduce(_ unionByName _)
  }

  /** One walk transition of [[deterministicWalks]]: the frontier is
    * |seeds| rows — broadcast it so the edge list is never shuffled; the
    * per-walk argmin partials combine map-side. Factored out so the plan
    * shape stays testable now that the step is checkpointed away from
    * the gate's final plan. */
  private[graft] def walkStep(cur: DataFrame, e: DataFrame,
                              outVerts: DataFrame, t: Int): DataFrame = {
    import graft.functions.PolyHash.poly_hash
    val f = broadcast(cur).alias("f")
    val moved = f.join(e.alias("e"), col("f.id") === col("e.src"))
      .select(col("f.walk").as("walk"),
        struct(
          poly_hash(concat_ws(":", col("f.id"), col("e.dst"), lit(t)))
            .as("h"),
          col("e.dst").as("dst")).as("hd"))
      .groupBy("walk").agg(min("hd").as("m"))
      .select(col("walk"), col("m.dst").as("id"))
    val stayed = f.join(broadcast(outVerts),
        col("f.id") === outVerts("src"), "left_anti")
      .select(col("f.walk").as("walk"), col("f.id").as("id"))
    moved.unionByName(stayed)
  }

  /** HITS hubs and authorities (Kleinberg, JACM 1999) on a DIRECTED edge
    * list, kept EXACT like [[eigenCentrality]]: from the all-ones hub
    * vector, `iters` rounds of a ← Aᵀh then h ← A·a stay in Long
    * arithmetic (a_k(v) / h_k(v) count alternating-direction walks), so
    * the only floats are the two final max-normalizations — one IEEE
    * division each, bit-equal across engines. On the ε-graph's
    * core→neighbor orientation, hub score concentrates on core points
    * and authority on well-covered neighbors.
    *
    * Plan: per round, two edge-keyed equi-joins + two map-side-combined
    * sums; sink/source vertices are re-added by a vertex-keyed left join
    * with 0 (unlike the symmetric eigenvector case the groupBy does NOT
    * re-emit the full vertex set). State stays O(|V|). Long headroom:
    * walks grow like deg^(2·iters) — iters=2 holds to degree ~4·10^4
    * hubs; beyond that, scale down or switch to float normalization per
    * round.
    *
    * @return (id, auth_walks, hub_walks, auth_score, hub_score), walks
    *         exact, scores max-normalized doubles (callers round).
    */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .localCheckpoint(eager = false)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = false)
    var h = verts.withColumn("hw", lit(1L))
    var a = verts.withColumn("aw", lit(0L))
    var it = 0
    while (it < iters) {
      val ain = e.join(h.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum("hw").as("w"))
      a = verts.join(ain, Seq("id"), "left")
        .select(col("id"), coalesce(col("w"), lit(0L)).as("aw"))
      val hout = e.join(a.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum("aw").as("w"))
      h = verts.join(hout, Seq("id"), "left")
        .select(col("id"), coalesce(col("w"), lit(0L)).as("hw"))
      it += 1
    }
    val mx = a.agg(max("aw").as("ma")).crossJoin(h.agg(max("hw").as("mh")))
    a.join(h, "id").crossJoin(broadcast(mx))
      .select(col("id"), col("aw").as("auth_walks"), col("hw").as("hub_walks"),
        (col("aw").cast("double") / col("ma").cast("double")).as("auth_score"),
        (col("hw").cast("double") / col("mh").cast("double")).as("hub_score"))
  }
}
