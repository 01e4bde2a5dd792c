package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants the driver contract depends on — pinned so a new
  * entry cannot silently ship half-wired. */
class RegistrySpec extends AnyFunSuite {

  /** Entries DELIBERATELY without a DuckDB oracle (the driver records a
    * weaker rows-only check). Every such exception carries its reason
    * here; anything else missing an oracle fails the suite. */
  private val rowsOnlyAllowed: Map[String, String] = Map.empty
  // (round 12: idx_lsh_build gained a real oracle via md5-derived band
  // keys — the last exception is gone; keep the mechanism for future
  // genuinely non-SQL-expressible entries.)

  test("every query either carries an oracle or is a documented " +
    "rows-only exception") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- rowsOnlyAllowed.keySet
    assert(missing.isEmpty,
      s"entries without oracle or documented exception: $missing")
    val stale = rowsOnlyAllowed.keySet -- q
    assert(stale.isEmpty, s"stale rows-only exceptions: $stale")
    val orphaned = o -- q
    assert(orphaned.isEmpty, s"oracles without a query entry: $orphaned")
  }

  test("baselineOnly names exist and stay the deliberate exactness " +
    "baselines") {
    assert(SparkEntry.baselineOnly.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.baselineOnly == Set("embed_neardup"))
  }

  test("oracle SQL strings are non-empty and DuckDB-shaped (no Spark-" +
    "only function names that a paste error could leave behind)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // Spark-only identifiers that have bitten before in hand-written
      // oracle SQL; DuckDB equivalents exist for each
      Seq("posexplode", "array_sort(", "collect_list", "xxhash64",
          "monotonically_increasing_id").foreach { fn =>
        assert(!sql.contains(fn),
          s"$name: oracle SQL contains Spark-only '$fn'")
      }
    }
  }
}
