package graft.graph

/** Flat cluster extraction from a condensed cluster tree — the FOSC
  * "excess of mass" selection of Campello et al., PAKDD'13 §4 (the step
  * HDBSCAN runs after the stability sweep to answer "which cluster is
  * each point in", the question the reference pipeline exists to answer,
  * cf. DBSCAN.py:172-179 for its single-cut special case).
  *
  * The tree comes from the discretized cut sweep with min-member-id
  * cluster labels: a cluster label persists while its component absorbs
  * larger-labeled clusters and dies when a smaller-labeled one absorbs
  * it, so `parent(x) < x` always, and along any root path death cuts
  * strictly increase. Stability is the integer excess-of-mass mass
  * (Σ sizes over the label's lifetime — hdbscan_stability's `sum_sizes`).
  *
  * This object is the pure driver-side DP over the BOUNDED per-cluster
  * table (one row per cluster label, never per point) — the distributed
  * parts (the cut-sweep CC and the final point labeling join) stay in
  * the caller's plan.
  */
object Fosc {

  /** Max condensed-tree size accepted by the driver-side DP — the
    * per-cluster table is dendrogram-bounded (≤ V−1 merges), in practice
    * orders of magnitude smaller; the require keeps the driver-scalar
    * contract enforced rather than assumed. */
  val MaxClusters: Int = 1 << 20

  /** The FOSC selection: the antichain of tree nodes maximizing total
    * stability. Bottom-up over labels in decreasing order (every child
    * label exceeds its parent's): a node is provisionally selected iff
    * its own stability is at least the best total achievable from its
    * children's subtrees (ties select the PARENT, as in the paper);
    * a selected ancestor then dissolves descendant selections — the
    * survivors are exactly the greedy-optimal non-overlapping cluster
    * set.
    *
    * @param stab   integer stability mass per cluster label
    * @param parent condensed-tree parent edges (child label → parent
    *               label); keys and values must appear in `stab`
    */
  def select(stab: Map[Long, Long], parent: Map[Long, Long]): Set[Long] = {
    require(stab.size <= MaxClusters,
      s"condensed tree has ${stab.size} clusters; driver-side FOSC is " +
        s"bounded at $MaxClusters")
    require(parent.keysIterator.forall(stab.contains) &&
      parent.valuesIterator.forall(stab.contains),
      "parent edges must connect labels present in the stability table")
    require(parent.forall { case (c, p) => p < c },
      "min-id labeling guarantees parent < child")
    val children = parent.toSeq.groupMap(_._2)(_._1)
    val sub = scala.collection.mutable.Map.empty[Long, Long]
    val sel = scala.collection.mutable.Set.empty[Long]
    stab.keys.toSeq.sorted(Ordering[Long].reverse).foreach { x =>
      val cs = children.getOrElse(x, Nil).iterator.map(sub).sum
      if (stab(x) >= cs) { sub(x) = stab(x); sel += x }
      else sub(x) = cs
    }
    def selectedAncestor(x: Long): Boolean = {
      var p = parent.get(x)
      while (p.isDefined) {
        if (sel(p.get)) return true
        p = parent.get(p.get)
      }
      false
    }
    sel.toSet.filterNot(selectedAncestor)
  }
}
