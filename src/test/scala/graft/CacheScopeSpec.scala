package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CacheScope

/** Regression guard for the query layer's cache ownership: every catalog
  * query, built under a caller-owned [[CacheScope]] and released after
  * materialization, must leave ZERO SQL-cache entries and ZERO RDD-level
  * cached blocks behind. Before this guard, 11 builders persisted
  * intermediates with no release path — the Verify/Bench harnesses hid it
  * by clearing the session cache between queries, but a library user
  * composing catalog queries in a long-lived session would accumulate
  * cached blocks until LRU eviction bit an active cache. A future builder
  * that adds a raw `.persist()` (or an untracked `localCheckpoint`) fails
  * here by name.
  */
class CacheScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every catalog query leaves nothing cached after a scoped build + release") {
    // start from a clean slate: other suites share this session and may
    // have left Unmanaged-scope blocks behind
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    for (spec <- SparkEntry.specs) {
      val scope = new CacheScope
      try spec.buildScoped(spark, TestSpark.sfSmoke, scope).count()
      finally scope.release()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"${spec.name}: SQL cache entries leaked past scope release()")
      val rdds = spark.sparkContext.getPersistentRDDs
      assert(rdds.isEmpty,
        s"${spec.name}: ${rdds.size} RDD-level cached blocks leaked past release()")
    }
  }
}
