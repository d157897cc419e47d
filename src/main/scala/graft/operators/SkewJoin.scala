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

  /** Inner/left equi-join of `large` with `small` on `key`, salted
    * `saltBuckets` ways. Both inputs must not already contain the
    * internal salt column. The salt is content-derived (xxhash64 of the
    * large row), so the operator stays deterministic end-to-end —
    * duplicate rows land in the same bucket, which only matters if a
    * single VALUE (not key) dominates.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val saltCol = "__graft_salt"
    require(!large.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not contain $saltCol")
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)),
        lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
