package graft.queries

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** Pins the cache-survival contract Bench.quiesce() relies on (round-6
  * verdict: the old comment CLAIMED operator caches survive the per-entry
  * `catalog.clearCache()` without evidence — this spec is the evidence):
  *
  *  - a localCheckpoint'd DataFrame (how the pair-graph index and the
  *    eval-gram table are held in their LRUs) keeps its RDD blocks across
  *    clearCache — blocks live in the BlockManager, not the catalog;
  *  - a plain persist()'d DataFrame does NOT survive — clearCache
  *    unpersists every catalog-cached plan, so no timed bench entry may
  *    rely on a persist() made by an earlier entry.
  */
class BenchHygieneSpec extends SparkSpec {

  test("localCheckpoint'd DataFrame survives catalog.clearCache()") {
    val df = spark.range(1000).toDF("i").localCheckpoint(true)
    assert(df.count() === 1000)
    spark.catalog.clearCache()
    // the functional proof: a locally-checkpointed RDD has NO lineage, so
    // this count can only succeed by reading the surviving blocks — had
    // clearCache dropped them, it would throw (checkpoint block lost),
    // not recompute
    assert(df.count() === 1000)
  }

  test("persist()'d DataFrame does NOT survive catalog.clearCache()") {
    val df = spark.range(1000).toDF("i").persist()
    df.count()
    assert(df.storageLevel !== StorageLevel.NONE)
    spark.catalog.clearCache()
    assert(df.storageLevel === StorageLevel.NONE,
      "clearCache drops catalog-cached plans — timed entries must not " +
        "rely on an earlier entry's persist()")
  }

  test("pair-graph-backed dedup is stable across clearCache") {
    val a = LlmPipeline.queries("dedup_canonical")(spark, sf).collect()
    spark.catalog.clearCache()
    val b = LlmPipeline.queries("dedup_canonical")(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
  }
}
