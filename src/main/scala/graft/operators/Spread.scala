package graft.operators

import org.apache.spark.sql.Dataset

/** Conditional pre-parse spread for CPU-bound per-row stages (HTML /
  * WARC / codec parsing): a compact parquet corpus can arrive as ONE
  * split, which would single-thread the whole chain (measured cpu/wall
  * 1 → 22 at 100× when spread) — but an UNCONDITIONAL
  * `repartition(defaultParallelism)` always exchanges the full input,
  * and when a crawl-scale corpus already arrives in MORE splits than
  * cores it both ships the raw documents once and REDUCES parallelism
  * to cores-many oversized partitions. The scale-correct rule: spread
  * only when the input has fewer splits than the cluster has slots,
  * and leave well-split inputs untouched (their split planning —
  * `spark.sql.files.maxPartitionBytes` — already spread them).
  *
  * SpreadSpec pins both sides: a one-split input gains an exchange, an
  * already-spread input's plan has NO Exchange. */
object Spread {

  /** Round-robin `ds` across `defaultParallelism` slots IFF it
    * currently has fewer partitions than that; identity otherwise.
    * A STREAMING input cannot be probed (`.rdd` is illegal before
    * `writeStream.start()`) and its micro-batches are typically
    * few-partition source slices, so it always spreads — the pre-fix
    * behavior, which was already correct for streams. */
  def forCpu[T](ds: Dataset[T]): Dataset[T] = {
    val par = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.isStreaming) ds.repartition(par)
    else if (ds.rdd.getNumPartitions < par) ds.repartition(par)
    else ds
  }
}
