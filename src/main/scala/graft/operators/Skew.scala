package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join handles most runtime skew; explicit salting remains the
  * tool when one side has a few pathological hot keys known in advance
  * (e.g. a null-ish default user owning 1% of 100 TB). `saltedJoin`
  * decomposes a hot-key equi-join:
  *
  *   left:  salt = deterministic hash(row) % factor   (spreads hot keys)
  *   right: replicated once per salt value             (factor × |right|)
  *   join on (key, salt)                               (parallelism × factor)
  *
  * Right-side replication cost means this suits dimension-sized or
  * pre-filtered right sides; for fact×fact skew prefer AQE. The salt is
  * derived from a stable column (not rand()) so retries/speculative tasks
  * stay deterministic.
  */
object Skew {

  /** Equi-join left⋈right on `key`, salting `factor` ways. `saltSource` is
    * a left-side column with high cardinality (e.g. the left PK) used to
    * derive the deterministic salt. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("_salt", pmod(hash(saltSource), lit(factor)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
