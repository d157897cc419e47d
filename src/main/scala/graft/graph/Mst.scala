package graft.graph

import graft.core.LineageCut
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Boruvka minimum spanning forest (Boruvka 1926; the
  * MapReduce contraction formulation follows Lattanzi et al.,
  * "Filtering: a method for solving graph problems in MapReduce",
  * SPAA'11) — the single-linkage backbone: the MSF of a mutual-distance
  * graph IS the dendrogram skeleton single-linkage / HDBSCAN clustering
  * builds on (Campello et al., PAKDD'13), which makes it the natural
  * companion to the ε-graph the DBSCAN gates already walk (the reference
  * builds that graph and only ever asks it for connected components,
  * DBSCAN.py:161-172).
  *
  * Determinism: edges are canonicalized to a < b and ranked by the TOTAL
  * order (w, a, b), so even with duplicate weights the forest is unique —
  * independent of partitioning, AQE decisions, and engine.
  *
  * Scale shape: the working graph is CONTRACTED each round — endpoints
  * are replaced by component ids, intra-component edges drop, and
  * parallel edges collapse to the lightest (keeping the original edge as
  * payload), so the edge set shrinks geometrically while components halve.
  * Per round that costs ONE map-side-combined per-component argmin, a
  * [[ConnectedComponents]] pass over the SELECTED edges only (≤ one edge
  * per live component), and one keyed collapse of the shrunken edge set;
  * the relabel joins are component-keyed and their right side (the
  * contraction map) shrinks with the rounds. O(log V) rounds; nothing
  * edge-scale ever collects to the driver.
  */
object Mst {

  /** @param edges forest edges (a, b, w, comp) — comp is the final
    *              component label (minimum vertex id, matching
    *              [[ConnectedComponents.run]]'s convention)
    * @param labels (id, comp) for every vertex incident to an input edge */
  final case class Forest(edges: DataFrame, labels: DataFrame)
      extends graft.core.QueryCache.Releasable {
    /** Free checkpoint blocks when evicted from [[graft.core.QueryCache]]. */
    def release(): Unit = {
      LineageCut.release(edges); LineageCut.release(labels)
    }
  }

  /** Minimum spanning forest of an undirected weighted graph.
    *
    * @param edges (src, dst, w) with Long-castable ids and integer
    *              weights; parallel edges keep the lightest, self-loops
    *              drop.
    */
  def boruvka(edges: DataFrame, maxRounds: Int = 16): Forest = {
    val base = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"),
        col("w").cast("long").as("w"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(min("w").as("w"))
      .localCheckpoint()

    var lab = base.select(col("a").as("id"))
      .union(base.select(col("b").as("id")))
      .distinct().select(col("id"), col("id").as("comp"))
      .localCheckpoint()

    // contracted multigraph: component endpoints (ca < cb) + the original
    // edge (w, oa, ob) riding along as the argmin payload
    var work = base.select(col("a").as("ca"), col("b").as("cb"),
        col("w"), col("a").as("oa"), col("b").as("ob"))
      .localCheckpoint(eager = false)
    var forest = base.limit(0)

    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      // each live component's lightest incident edge, offered from both
      // endpoints; (w, oa, ob) is a total order over unique canonical
      // edges, so the min — and with it the forest — is unique
      val st = struct(col("w"), col("oa"), col("ob"), col("ca"), col("cb"))
      val cand = work.select(col("ca").as("comp"), st.as("e"))
        .union(work.select(col("cb").as("comp"), st.as("e")))
      val sel = cand.groupBy("comp").agg(min("e").as("e"))
        .select(col("e.w").as("w"), col("e.oa").as("oa"),
          col("e.ob").as("ob"), col("e.ca").as("ca"), col("e.cb").as("cb"))
        .distinct() // the same edge can win for both of its components
        .localCheckpoint(eager = false)

      if (sel.isEmpty) done = true
      else {
        forest = forest.unionByName(
            sel.select(col("oa").as("a"), col("ob").as("b"), col("w")))
          .localCheckpoint(eager = false)
        // contraction map over the selected edges (≤ one per component)
        val cc = ConnectedComponents
          .run(sel.select(col("ca").as("src"), col("cb").as("dst")))
        def remap(df: DataFrame, on: String, out: String): DataFrame =
          df.join(cc.select(col("id").as(on), col("component").as(out)),
            Seq(on), "left")
        // relabel endpoints, drop intra edges, collapse parallels to the
        // lightest — the geometric shrink that keeps later rounds cheap
        val x = coalesce(col("na"), col("ca"))
        val y = coalesce(col("nb"), col("cb"))
        val w2 = remap(remap(work, "ca", "na"), "cb", "nb")
          .where(x =!= y)
          .select(least(x, y).as("ca"), greatest(x, y).as("cb"),
            struct(col("w"), col("oa"), col("ob")).as("e"))
          .groupBy("ca", "cb").agg(min("e").as("e"))
          .select(col("ca"), col("cb"), col("e.w").as("w"),
            col("e.oa").as("oa"), col("e.ob").as("ob"))
          .localCheckpoint(eager = false)
        val left = w2.count() // materialize before releasing the old graph
        LineageCut.release(work)
        work = w2
        val grown = lab
          .join(cc.select(col("id").as("comp"), col("component")),
            Seq("comp"), "left")
          .select(col("id"), coalesce(col("component"), col("comp")).as("comp"))
          .localCheckpoint(eager = false)
        grown.count()
        LineageCut.release(lab)
        lab = grown
        done = left == 0
      }
      round += 1
    }
    // stamp forest edges with the final component label of endpoint a
    // (both endpoints converged to the same label by construction)
    val fin = forest
      .join(lab.select(col("id").as("a"), col("comp")), "a")
      .select(col("a"), col("b"), col("w"), col("comp"))
    LineageCut.release(base)
    Forest(fin, lab)
  }
}
