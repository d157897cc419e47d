package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * A plain shuffle join on a skewed key sends every row of a hot key to a
  * single task; at 100 TB one hot key (a viral domain, a bot user, a
  * dominant event type) stalls the whole stage. Salting splits each key's
  * rows across `saltBuckets` tasks: the large side derives a deterministic
  * salt in [0, saltBuckets) from its row content, the small side is
  * replicated once per salt value, and the join key becomes (key, salt).
  * The result is row-identical to the plain join (SkewJoinSpec) at the
  * cost of a `saltBuckets`-fold blow-up of the SMALL side only — the
  * standard space/time trade for skew, useful when the small side is too
  * large to broadcast but cheap to replicate, and complementary to AQE's
  * skew split (which only kicks in after a stage has already materialized
  * skewed shuffle blocks).
  */
object SkewJoin {

  /** Join types for which small-side replication is semantics-preserving:
    * every result row (or large-side probe, for semi/anti) still matches
    * exactly one salt replica. Right/full-outer are excluded — an
    * unmatched small-side row would surface once per replica.
    */
  private val SupportedJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
    "left_anti", "leftanti")

  /** Inner/left-family equi-join of `large` with `small` on `key`, salted
    * `saltBuckets` ways. Both inputs must not already contain the
    * internal salt column. The salt is content-derived (xxhash64 of
    * `saltCols` — default: every large-side column), so the operator stays
    * deterministic end-to-end — duplicate rows land in the same bucket,
    * which only matters if a single VALUE (not key) dominates. Pass an
    * explicit `saltCols` when the large side carries columns `xxhash64`
    * cannot hash (MapType) — the analyzer rejects those at plan time.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner",
                 saltCols: Seq[String] = Nil): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-family joins only, got '$joinType': " +
        "right/full outer would emit unmatched small-side rows once per salt replica")
    val saltCol = "__graft_salt"
    require(!large.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not contain $saltCol")
    val hashed = if (saltCols.nonEmpty) saltCols else large.columns.toSeq
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(struct(hashed.map(col): _*)),
        lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Exact within-group all-pairs self-join with BOUNDED per-task pair
    * work (triangle blocking). A plain `a.join(b, group)` with
    * `id_a < id_b` puts the whole O(n_g²) pair verification of a group
    * in the task that owns its key — one hot group (a mega-cluster of
    * near-identical embeddings, a boilerplate bucket) stalls the stage
    * at 100 TB. Here each group of n_g rows is split into
    * S_g = ceil(n_g / cap) deterministic hash slices of its id, and the
    * S_g·(S_g+1)/2 slice pairs (p ≤ q) become independent equi-join
    * blocks keyed (group, p, q): a row with slice s joins as the a-side
    * of blocks (s, q≥s) and the b-side of blocks (p≤s, s), so the hot
    * group's pair work spreads over O(S_g²) tasks, each comparing
    * ~cap × cap rows. Unlike sub-bucketing (which silently drops
    * cross-slice pairs), the output is ROW-IDENTICAL to the plain pair
    * join: every unordered pair of distinct rows in a group appears
    * EXACTLY once — slices p < q emit a pair once by construction, the
    * diagonal p = q keeps `id_a < id_b`; off-diagonal pairs surface in
    * hash order, so `id_a < id_b` does NOT hold globally — symmetric
    * consumers (distances) are unaffected, ordered ones should use
    * least/greatest. Replication cost: a row is materialized S_g + 1
    * times — O(pair work / cap), the price of exactness under skew.
    *
    * `idCol` must be unique per row (slice assignment hashes it);
    * payload columns come back suffixed `_a`/`_b`.
    *
    * NOTE the input plan executes THREE times (the size agg + each join
    * side) — `rows` should be a cheap scan/projection or an already
    * materialized (checkpointed/cached) frame; this operator does not
    * materialize it because it cannot know the caller's release
    * discipline.
    */
  def blockedSelfPairs(rows: DataFrame, groupCol: String, idCol: String,
                       cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val internal = Seq("__graft_n", "__graft_s", "__graft_salt",
      "__graft_p", "__graft_q")
    require(internal.forall(c => !rows.columns.contains(c)),
      s"input must not contain ${internal.mkString(", ")}")
    val payload = rows.columns.toSeq.filterNot(c =>
      c == groupCol || c == idCol)
    // per-group slice count from a first-pass size agg; the size table is
    // one row per group — broadcast, never a shuffle of the data side
    val sizes = rows.groupBy(groupCol)
      .agg(count(lit(1)).as("__graft_n"))
      .withColumn("__graft_s",
        expr(s"CAST((__graft_n + ${cap - 1}) DIV $cap AS INT)"))
      .drop("__graft_n")
    val salted = rows.join(broadcast(sizes), groupCol)
      .withColumn("__graft_salt",
        pmod(xxhash64(col(idCol)), col("__graft_s").cast("long"))
          .cast("int"))
    def sided(sfx: String, p: Column => Column, q: Column => Column) =
      salted.select(
        Seq(col(groupCol), p(col("__graft_salt")).as("__graft_p"),
          q(col("__graft_salt")).as("__graft_q"),
          col(idCol).as(idCol + sfx)) ++
          payload.map(c => col(c).as(c + sfx)): _*)
    val a = sided("_a", identity,
      s => explode(sequence(s, col("__graft_s") - 1)))
    val b = sided("_b",
      s => explode(sequence(lit(0), s)), identity)
    a.join(b, Seq(groupCol, "__graft_p", "__graft_q"))
      .where(col("__graft_p") =!= col("__graft_q") ||
        col(idCol + "_a") < col(idCol + "_b"))
      .drop("__graft_p", "__graft_q")
  }
}
