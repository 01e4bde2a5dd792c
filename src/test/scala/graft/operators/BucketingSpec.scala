package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both fact tables pre-bucketed on the join key
  * ⇒ the sort-merge join runs with NO shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("equi-join of co-bucketed tables plans no Exchange") {
    val s = spark
    Bucketing.writeBucketed(
      Tables.lineitem(s, sf).select("l_orderkey", "l_extendedprice"),
      "g_li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(s, sf).select("o_orderkey", "o_totalprice"),
      "g_o_bucketed", "o_orderkey", 8)
    val joined = s.table("g_li_bucketed")
      .join(hint(s.table("g_o_bucketed"), "merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is still correct
    val n = joined.count()
    val ref = Tables.lineitem(s, sf)
      .join(Tables.orders(s, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(n == ref)
  }

  private def hint(df: org.apache.spark.sql.DataFrame, h: String) =
    df.hint(h)
}
