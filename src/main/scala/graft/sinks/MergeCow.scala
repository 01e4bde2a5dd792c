package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write partition rewrite — the file-level half of a lakehouse
  * MERGE INTO (the join half is queries.Relational.qMergeUpsert): the
  * merge join identifies the partitions the change feed touches, ONLY
  * those partitions' files are rewritten, and the swap rides directory
  * renames so readers see whole old partitions or whole new ones, never
  * a half-written mix of files within a partition.
  *
  * Scale shape: MERGE cost is bounded by the touched data, not the table
  * size — an untouched partition's files are never opened, copied, or
  * rewritten (MergeCowSpec pins byte-identity). The touched-partition
  * list is commit metadata (driver-held, like a Delta/Iceberg commit's
  * file list); the rewrite itself is one partition-pruned scan + one
  * Spark-committed write. */
object MergeCow {

  /** Rewrite ONLY the `touched` partitions of the `partCol`-partitioned
    * table at `tableDir` with `newData` (must carry `partCol` and contain
    * only rows belonging to touched partitions — including rows the feed
    * did NOT match, since their files are replaced).
    *
    * Protocol: Spark writes `newData` into a scratch dir beside the
    * table under its own job-commit protocol (task temp files + rename),
    * so the scratch holds a complete, committed partition set before any
    * swap; then each touched partition directory is deleted and the new
    * one renamed into place. A touched partition with no surviving rows
    * (all deleted) simply has its directory removed. */
  def rewritePartitions(s: SparkSession, tableDir: String, partCol: String,
                        touched: Seq[String], newData: DataFrame): Unit = {
    val hconf = s.sparkContext.hadoopConfiguration
    val table = new Path(tableDir)
    val fs = table.getFileSystem(hconf)
    val tmp = new Path(table.getParent,
      s"_cow_${java.util.UUID.randomUUID().toString.take(8)}")
    // repartition by the partition column: without it every task writes
    // a file into every touched partition dir (tasks x partitions files)
    newData.repartition(col(partCol))
      .write.partitionBy(partCol).parquet(tmp.toString)
    try {
      touched.foreach { v =>
        val dirName = s"$partCol=$v"
        val oldDir = new Path(table, dirName)
        val newDir = new Path(tmp, dirName)
        fs.delete(oldDir, true)
        if (fs.exists(newDir)) fs.rename(newDir, oldDir)
      }
    } finally fs.delete(tmp, true)
  }
}
