package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical executor for the token-balanced shard plan
  * (queries.LlmPipeline.sampleShards): writes the corpus as
  * `outDir/shard=NNN/part-*.parquet`, one Hive-style partition directory
  * per shard, sized by token mass rather than row count.
  *
  * Scale design:
  *  - the shard column comes from the same two-level token-prefix
  *    assignment the manifest query reports, so the write IS the plan —
  *    a reader can trust `shard=k` to hold a contiguous, near-equal
  *    token range (the property training loaders want: any shard subset
  *    is an unbiased, size-predictable sample).
  *  - `repartition(col("shard"))` before `partitionBy` means each shard
  *    directory is written by exactly the tasks owning that shard's rows
  *    — without it every task appends a file into EVERY partition
  *    directory (the classic small-files explosion: tasks × shards
  *    files at 100 TB).
  *  - `maxRecordsPerFile` bounds individual file size inside a shard so
  *    a skewed shard still splits into scan-parallel files.
  * The parquet layout is self-describing (Hive partition discovery
  * restores the shard column on read), so downstream engines — Spark,
  * DuckDB, Trino — can prune by shard with no manifest lookup. */
object ShardedWriter {

  /** Write `docs` (must carry doc_id + text) into `shards` token-balanced
    * partition directories under `outDir`; returns the per-shard manifest
    * read back FROM THE WRITTEN FILES (doc/token counts as a reader will
    * see them — the write-audit a pipeline records, not an estimate). */
  def writeShards(s: SparkSession, docs: DataFrame, outDir: String,
                  shards: Int = 16, maxRecordsPerFile: Long = 1000000L)
      : DataFrame = {
    graft.queries.LlmPipeline.shardAssignments(docs, shards)
      .repartition(col("shard"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
    s.read.parquet(outDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
      .orderBy("shard")
  }

  /** Streaming micro-batch APPEND (the foreachBatch body of
    * u_stream_shards): shard THIS batch by its own token mass — each
    * ingest increment lands as a self-contained token-balanced shard set
    * under `batch_id=B/shard=K/`, so a training loader can consume
    * increments independently (read one batch's shards) or together
    * (partition discovery unions them; pruning works on both columns).
    * Same repartition-before-partitionBy and maxRecordsPerFile bounds as
    * the batch writer.
    *
    * EXACTLY-ONCE on retry: Structured Streaming re-executes a micro-
    * batch under the SAME batch_id after a failure, and a plain append
    * would duplicate the batch's rows. Dynamic partition overwrite makes
    * re-execution idempotent: the write replaces exactly the partitions
    * present in the incoming data — all under `batch_id=B/` since the
    * batch_id column is a literal — and never touches other batches'
    * directories (spec-pinned byte-identical in ShardContractSpec). The
    * commit unit stays the micro-batch. */
  def appendBatch(batch: DataFrame, outDir: String, batchId: Long,
                  shards: Int = 16,
                  maxRecordsPerFile: Long = 1000000L): Unit =
    graft.queries.LlmPipeline.shardAssignments(batch, shards)
      .withColumn("batch_id", lit(batchId))
      .repartition(col("shard"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("batch_id", "shard")
      .parquet(outDir)
}
