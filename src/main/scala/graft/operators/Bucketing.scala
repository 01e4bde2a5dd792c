package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time, join forever
  * shuffle-free.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
  * both sides. Bucketing both tables by the join key with the same bucket
  * count makes Spark plan a sort-merge join that reads co-located buckets
  * directly — no Exchange on either side (BucketingSpec asserts this).
  * Use for the stable, repeatedly-joined keys of a lakehouse layout
  * (orderkey, custkey, doc_id); AQE still handles the residual skew.
  */
object Bucketing {

  /** Write df as a bucketed, sorted managed table. Idempotent even across
    * fresh metastores pointing at a pre-existing warehouse dir (drops the
    * table AND clears the orphan location, via the Hadoop FileSystem API
    * so any warehouse scheme works — file:, hdfs:, s3a:). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(s: SparkSession, name: String): DataFrame = s.table(name)

  /** Tables already laid out by this JVM, keyed (table, source token) —
    * the bucketed write is the lakehouse's ONE-TIME layout cost, so
    * repeat calls (a warmed bench run, the rerank of a verify pass) must
    * not pay or re-measure it. */
  private val prepared =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** writeBucketed exactly once per (table, token) per JVM; token names
    * the source data (e.g. the sf dir) so a different input re-lays-out. */
  def ensureBucketed(df: => DataFrame, table: String, key: String,
                     buckets: Int, token: String): Unit = {
    if (!prepared.contains((table, token))) synchronized {
      if (!prepared.contains((table, token))) {
        writeBucketed(df, table, key, buckets)
        prepared.removeIf(_._1 == table) // stale tokens for this table
        prepared.add((table, token))
      }
    }
  }
}
