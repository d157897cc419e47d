package graft

import graft.core.{LineageCut, QueryCache}

/** The shared-build memo ([[graft.core.QueryCache]]): build-once
  * semantics, keyed isolation, and eviction that both forces a rebuild
  * and releases the evicted checkpoint's storage blocks. */
class QueryCacheSpec extends GraftSuite {

  test("shared builds once per (key, session, dir) and memoizes the value") {
    var builds = 0
    def get() = QueryCache.shared("spec.count", spark, "dirA") {
      builds += 1; builds
    }
    assert(get() == 1 && get() == 1 && builds == 1)
    // a different dir is a different entry
    QueryCache.shared("spec.count", spark, "dirB") { builds += 1; builds }
    assert(builds == 2)
    QueryCache.evict("spec.count", spark, "dirA")
    QueryCache.evict("spec.count", spark, "dirB")
  }

  test("evict forces the next shared call to rebuild") {
    var builds = 0
    def get() = QueryCache.shared("spec.rebuild", spark, "d") {
      builds += 1; builds
    }
    assert(get() == 1)
    QueryCache.evict("spec.rebuild", spark, "d")
    assert(get() == 2 && builds == 2)
    QueryCache.evict("spec.rebuild", spark, "d")
  }

  test("evicting a checkpointed Dataset releases its cached blocks") {
    import spark.implicits._
    val df = QueryCache.shared("spec.ckpt", spark, "d") {
      (1 to 100).toDF("x").localCheckpoint()
    }
    val rdd = LineageCut.backingRdd(df)
      .getOrElse(fail("checkpointed plan must be an RDD leaf"))
    assert(rdd.getStorageLevel.useMemory, "checkpoint must be persisted")
    QueryCache.evict("spec.ckpt", spark, "d")
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "eviction must unpersist the checkpoint's RDD")
  }

  test("evicting a Releasable value calls its release hook") {
    var released = false
    val model = new QueryCache.Releasable {
      override def release(): Unit = released = true
    }
    QueryCache.shared("spec.releasable", spark, "d") { model }
    QueryCache.evict("spec.releasable", spark, "d")
    assert(released, "Releasable values (models) must be freed on evict")
  }

  test("evictSession drops only that session's entries") {
    QueryCache.shared("spec.sess", spark, "d") { 42 }
    val before = QueryCache.size
    QueryCache.evictSession(spark)
    assert(QueryCache.size < before)
    // gone: a re-get rebuilds
    var rebuilt = false
    QueryCache.shared("spec.sess", spark, "d") { rebuilt = true; 43 }
    assert(rebuilt)
    QueryCache.evictSession(spark)
  }
}
