package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All reads are plain parquet scans: column pruning and predicate pushdown
  * are handled by Catalyst — callers select/filter and the scan narrows
  * (verified via .explain: PushedFilters / ReadSchema).
  *
  * Timestamp normalization:
  *  - `orders`/`lineitem` store TIMESTAMP(MILLIS, adjusted=false) → Spark
  *    reads TIMESTAMP_NTZ; we cast to session-TZ timestamps (session is UTC,
  *    so the instant is unchanged) so the full timestamp function surface
  *    (unix_micros, window(), intervals) applies.
  *  - `events.ts` has shipped in two physical encodings across driver
  *    generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
  *    accepts as long via spark.sql.legacy.parquet.nanosAsLong=true — we
  *    reduce to micros by truncating integer division, which is what
  *    DuckDB does too) and plain TIMESTAMP(MICROS) (read natively as
  *    TIMESTAMP_NTZ). `normTs` adapts to whichever the scan produced so
  *    queries always see a session-TZ (UTC) timestamp with identical
  *    instants either way.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def ltz(c: String): Column = col(c).cast("timestamp")

  /** Normalize an events-style `ts` column to a session-TZ timestamp
    * regardless of the on-disk physical type. Works on batch and streaming
    * DataFrames alike (dispatch is on the analyzed schema only). The nanos
    * branch uses TRUNCATING integer division (`div`, toward zero — what
    * DuckDB does too; differs from floor only for pre-1970 instants).
    * Exhaustive on the two encodings the driver has ever shipped: a third
    * one must fail loudly here, not surface as silently-null timestamps
    * downstream. */
  def normTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.TimestampType =>
      df.withColumn("ts", ltz("ts"))
    case other => throw new IllegalArgumentException(
      s"events.ts has unexpected physical type $other; expected " +
        "TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").withColumn("o_orderdate", ltz("o_orderdate"))
  def lineitem(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").withColumn("l_shipdate", ltz("l_shipdate"))
  def events(s: SparkSession, d: String): DataFrame =
    normTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Corpus row counts, cached per (session, dir, table) — round-6
    * verdict finding #5: adaptive operators (count-derived packing /
    * shuffle / shard buckets, LSH signature widths, SemDeDup k) each ran
    * their own full `count()` of an immutable test table, an extra
    * corpus pass per operator invocation at 100 TB for one scalar. One
    * count per table per session now; on a lakehouse this would read
    * table statistics instead of scanning at all. */
  /** Stable per-session cache-key token. identityHashCode is NOT one:
    * after a session is GC'd a new session can collide on the same hash
    * and be served a stale count — or a checkpointed DataFrame bound to a
    * stopped SparkContext. The WeakHashMap drops a session's token with
    * the session, so tokens are unique across a JVM's lifetime. */
  private val sessionTokens = new java.util.WeakHashMap[SparkSession, String]()

  private[graft] def sessionToken(s: SparkSession): String =
    sessionTokens.synchronized {
      var tok = sessionTokens.get(s)
      if (tok == null) {
        tok = java.util.UUID.randomUUID().toString
        sessionTokens.put(s, tok)
      }
      tok
    }

  private val countCache =
    new graft.util.LruCache[(String, String, String), Long](64)

  def cachedCount(s: SparkSession, d: String, name: String): Long =
    countCache.getOrElseUpdate((sessionToken(s), d, name))(
      t(s, d, name).count())
}
