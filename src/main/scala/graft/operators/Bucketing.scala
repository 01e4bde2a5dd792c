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
    * table AND clears the orphan location). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
