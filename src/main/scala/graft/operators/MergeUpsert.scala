package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-versioned last-writer-wins merge — the upsert/CDC primitive behind
  * an incrementally-refreshed corpus snapshot: yesterday's snapshot plus a
  * batch of inserts, re-crawls and tombstones becomes today's snapshot in
  * one pass, without a mutable table format.
  *
  * Spark-first shape: tag and `unionByName` the two sides (schema-aligned
  * by name, no positional fragility), then pick each key's winner with
  * `row_number` over a key-partitioned window ordered by (version desc,
  * side desc). The window's partition key IS the merge key, so the single
  * shuffle is keyed and map-side-combinable work is nil by construction —
  * at 100 TB this is one sort-merge-shaped exchange of snapshot+delta,
  * with AQE splitting any hot key, and nothing driver-side. Tombstones
  * (rows whose `deleteCol` is true) win like any other version and are
  * dropped AFTER the winner is chosen, so a delete beats the base row it
  * targets instead of vanishing silently.
  *
  * Ties: equal versions resolve delta-over-base (side desc), then by any
  * caller-provided total order implicit in `versionCol`; production
  * batches carry a monotone version (commit ts / batch id), so ties only
  * arise within one malformed batch.
  */
object MergeUpsert {

  /** Merge `updates` into `base` by `keys`: per key, the row with the
    * highest `versionCol` wins (updates beat base at equal version);
    * winners whose `deleteCol` is true are dropped. Output columns =
    * base's columns (minus nothing — version/delete columns are the
    * caller's to keep or drop). */
  def lastWriterWins(base: DataFrame, updates: DataFrame, keys: Seq[String],
                     versionCol: String, deleteCol: String): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val tagged = base.withColumn("__side", lit(0))
      .unionByName(updates.withColumn("__side", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__side").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !col(deleteCol))
      .drop("__rn", "__side")
  }
}
