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
  *  - `events.ts` is TIMESTAMP(NANOS) which Spark's vectorized reader
  *    rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true and we
  *    rebuild the column as micros (floor division — matches DuckDB's
  *    truncation of nanos to its native micros resolution).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def ltz(c: String): Column = col(c).cast("timestamp")

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
    t(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
