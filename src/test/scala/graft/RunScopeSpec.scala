package graft

import org.apache.spark.storage.StorageLevel

import graft.RunScope.ScratchCacheOps

class RunScopeSpec extends SparkSpec {

  test("scratchCache caches lazily; releaseAll unpersists exactly the registered frames") {
    val a = spark.range(100).toDF("id").scratchCache()
    val keep = spark.range(50).toDF("id").filter(org.apache.spark.sql.functions.col("id") > 5).cache()
    // registration is eager, materialization lazy — same contract as .cache()
    assert(a.storageLevel != StorageLevel.NONE, "scratchCache must register in the cache manager")
    a.count() // materialize
    RunScope.releaseAll()
    assert(a.storageLevel == StorageLevel.NONE,
      "releaseAll must unpersist run-scoped scratch")
    assert(keep.storageLevel != StorageLevel.NONE,
      "frames cached OUTSIDE RunScope are not touched")
    keep.unpersist()
  }

  test("releaseAll is idempotent and safe on an empty registry") {
    RunScope.releaseAll()
    RunScope.releaseAll() // nothing registered — must not throw
    val b = spark.range(10).toDF("id").scratchCache()
    RunScope.releaseAll()
    RunScope.releaseAll() // second drain after the queue emptied
    assert(b.storageLevel == StorageLevel.NONE)
  }

  test("unpersisted scratch still computes correctly via lineage") {
    val c = spark.range(1, 11).toDF("id").scratchCache()
    RunScope.releaseAll() // released BEFORE any action: cache is a no-op
    assert(c.count() == 10, "release before the action must not break the plan")
  }
}
