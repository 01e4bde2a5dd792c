package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Helpers shared by the oracle-checked query pack.
  *
  * The driver hash-compares our parquet output against DuckDB's result for
  * the same SQL. Floating-point SUM/AVG are order-dependent, and Spark and
  * DuckDB reduce in different orders — so every money/measure aggregate here
  * goes through an exact DECIMAL(18,2) accumulation (order-independent),
  * then back to DOUBLE via arithmetic that is bit-identical in both engines
  * (same IEEE-754 double ops on the same exact inputs).
  */
object QueryUtil {
  /** Exact 2-dp decimal view of a double measure column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent SUM of a 2-dp measure, returned as DOUBLE. */
  def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** AVG as exact-sum / count in double space, rounded to 6 dp.
    * DuckDB equivalent: round(CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
    */
  def avgd(c: Column, n: Column): Column =
    round(sum(dec(c)).cast(DoubleType) / n, 6)

  /** SQL fragment builders mirroring the above, so the Spark expression and
    * the DuckDB oracle stay textually in sync. */
  def sqlSumd(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvgd(col: String, n: String): String =
    s"round(CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / $n, 6)"

  /** Run `body` with the shuffle-partition conf pinned — iterative
    * operators over SMALL frames (a near-dup pair graph) otherwise pay
    * the full default partition count on every one of their many jobs.
    * On a cluster the caller sizes this to the actual graph. */
  def withShufflePartitions[T](s: org.apache.spark.sql.SparkSession, n: Int)
                              (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}
