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
    * derive the deterministic salt. Only inner/left joins are correct
    * under right-side replication (an unmatched right row would surface
    * `factor` times in a right/full outer), so others are rejected; the
    * salt column name is collision-checked against both inputs. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "")
    require(Set("inner", "left", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salt = Iterator.from(0).map(i => s"_salt$i")
      .find(c => !left.columns.contains(c) && !right.columns.contains(c)).get
    val salted = left.withColumn(salt, pmod(hash(saltSource), lit(factor)))
    val replicated = right.withColumn(salt,
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, salt), joinType).drop(salt)
  }
}
