package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Tuned for the test harness (local[N], single JVM) but every setting is
  * chosen to also be correct on a large cluster:
  *  - AQE on: runtime coalescing / skew-join handling is the scale story.
  *  - shuffle.partitions kept small locally; on a real cluster this is
  *    overridden by AQE's coalescing + initialPartitionNum.
  *  - autoBroadcastJoinThreshold left at default; we additionally broadcast
  *    explicitly where dimension sizes are known (region/nation/supplier).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let AQE right-size CACHED plans' output partitioning too (off by
      // default): a persist()'d table's final exchange otherwise always
      // materializes at the static shuffle-partition count — measured on
      // q_pagerank's cached edge table, 555→63 tasks and 91s→27s task
      // CPU for the same result. Consumers re-derive requirements from
      // whatever the cache reports, so plans stay correct either way.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // Text-pipeline scans are CPU-bound (tokenize + gram explosion +
      // hashing per row), so size scan splits for cores, not I/O: 32 MB
      // keeps a ~1 GB corpus file wide enough to use every local core
      // (measured on the 100x tier's contamination scan: 15 -> 48 tasks
      // over the same file, 77s of per-task CPU spread instead of
      // queued). Small-SF files stay single-split either way.
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      // events.parquet stores TIMESTAMP(NANOS); read as long + convert
      // (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Deterministic FP behavior for oracle comparison.
      .config("spark.sql.ansi.enabled", "false")
      // BloomFilterAggregate SILENTLY clamps items/bits to these confs
      // (Math.min in its lazy vals): the defaults (4M items / 2^26
      // bits) froze q_bloom_join's filter size at ~6M dim keys and let
      // FPR grow with key count (measured 669 MB of FPR-inflated
      // exchange at SF100). Raise the ceilings so count-derived sizing
      // stays at its design point up to the MEMORY-derived bound the
      // builders also use: 2^28 bits = a 32 MB per-task aggregation
      // buffer (~1 GB across 32 concurrent partials) — past that,
      // shard the filter instead of growing it.
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        (1L << 26).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        (1L << 28).toString)

  /** Local session used by tests and ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
