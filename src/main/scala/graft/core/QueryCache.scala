package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.concurrent.TrieMap

/** Per-(session, dir) memoization of shared gate-query builds.
  *
  * Several gate families walk the same expensive intermediate — the ε=2.0
  * pair set feeds four clustering gates, the jaccard pair graph feeds
  * jaccard_pairs AND dedup_groups, the sign-band LSH pair graph feeds
  * embed_pairs_lsh AND embed_dedup — and a real user computes each once.
  * Before round 8 every family hand-rolled the same TrieMap +
  * `localCheckpoint()` idiom with no eviction; this is the one shared
  * implementation, with the test-visible [[evict]] the shuffle-budget
  * suite needs to measure a memoized build's plan (warm the memo, evict,
  * re-run measured — the second run now rebuilds instead of reading the
  * checkpoint).
  *
  * Lifecycle: entries live for the session by design (the bench harness
  * IS the session); [[evict]]/[[evictSession]] release checkpoint blocks
  * deterministically via [[LineageCut]] when the cached value is a
  * checkpointed Dataset, so tests and long-lived sessions are not at the
  * mercy of driver GC timing for executor storage memory.
  */
object QueryCache {

  /** Cached values that hold persisted resources beyond a single
    * checkpointed Dataset (models bundling several persisted frames)
    * implement this so [[evict]]/[[evictSession]] can free them. */
  trait Releasable { def release(): Unit }

  private val cache = TrieMap.empty[(String, SparkSession, String), Any]

  /** Memoize `build` under (`key`, session, dir). `build` runs at most
    * once per live entry (modulo a benign race on first concurrent
    * access, as with the TrieMaps this replaces); callers that want the
    * value materialized should `localCheckpoint()` inside `build`. */
  def shared[T](key: String, s: SparkSession, dir: String)(build: => T): T =
    cache.getOrElseUpdate((key, s, dir), build).asInstanceOf[T]

  /** Drop one entry, eagerly releasing its checkpoint blocks if the value
    * is a checkpointed Dataset (see [[LineageCut.release]] caveats — the
    * caller asserts nothing will read the evicted Dataset again). No-op
    * if absent. */
  def evict(key: String, s: SparkSession, dir: String): Unit =
    cache.remove((key, s, dir)).foreach(release)

  /** Drop every entry belonging to `s` (session teardown). */
  def evictSession(s: SparkSession): Unit =
    cache.keys.filter(_._2 eq s).foreach(k => cache.remove(k).foreach(release))

  /** Entries currently cached — exposed for specs. */
  private[graft] def size: Int = cache.size

  private def release(v: Any): Unit = v match {
    case d: Dataset[_]  => LineageCut.release(d)
    case r: Releasable  => r.release()
    case _              => ()
  }
}
