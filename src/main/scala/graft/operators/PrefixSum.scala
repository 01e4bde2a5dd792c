package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TWO-LEVEL PREFIX COMPOSITION idiom (see ARCHITECTURE.md): a
  * deterministic global order / global running total over an arbitrarily
  * large corpus with NO global sort and NO single wide window —
  * parallelism scales with the corpus, and the only single-task step
  * touches the (tiny) per-bucket totals table.
  *
  *   level 1: rows are hashed into count-derived buckets; each bucket
  *            computes its running metric independently (a window
  *            partitioned by bucket — parallel across buckets);
  *   level 2: per-bucket totals (nBuckets rows) get a running base
  *            offset via one window over the totals table alone;
  *            composing `boff + end_in_b` yields the exact global
  *            prefix in bucket-major order.
  *
  * Used by text_packing, sample_shuffle, sample_shards, and
  * sample_curriculum (round-6 verdict ask #8: one documented contract
  * instead of four subtly-different repetitions — the subtle variations
  * are now parameters, so the next operator cannot reintroduce a global
  * sort by copy-editing).
  */
object PrefixSum {

  /** Count-derived bucket count: one bucket per ~4096 rows, floor 8.
    * The oracle derives the identical value from its own count(*). */
  def bucketCount(corpusRows: Long): Long =
    math.max(8L, (corpusRows + 4095L) / 4096L)

  /** Append `end_in_b` (inclusive running `metric` within each
    * (partition ++ order) group, ordered by `tieBreak`) and `boff` (the
    * group's global base offset: running sum of whole-group totals over
    * groups ordered by `order` within `partition`) to `df`.
    *
    * The global inclusive prefix of a row in bucket-major order is then
    * `boff + end_in_b`; a 1-based rank is the same with `metric`
    * = lit(1).
    *
    *  - `partition`: columns the global order RESTARTS at (e.g. epoch —
    *    each epoch is its own complete permutation). May be empty.
    *  - `order`: the bucket-major columns (e.g. bucket, or
    *    stage+bucket for a staged curriculum) — the level-2 window
    *    orders whole groups by these.
    *  - `tieBreak`: total order within a group (must be unique per row
    *    for a deterministic permutation — callers use (h, doc_id)).
    */
  def twoLevel(df: DataFrame, partition: Seq[String], order: Seq[String],
               metric: Column, tieBreak: Seq[Column]): DataFrame = {
    val groupCols = (partition ++ order).map(col)
    val inW = Window.partitionBy(groupCols: _*).orderBy(tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bw = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = df.groupBy(groupCols: _*)
      .agg(sum(metric).as("bn"))
      .select(groupCols :+
        coalesce(sum(col("bn")).over(bw), lit(0L)).as("boff"): _*)
    df.withColumn("end_in_b", sum(metric).over(inW))
      .join(totals, partition ++ order)
  }
}
