package graft.operators

import org.apache.spark.sql.DataFrame
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
}
