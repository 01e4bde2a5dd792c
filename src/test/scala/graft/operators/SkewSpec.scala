package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  test("salted join returns exactly the plain join's rows") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val plain = o.join(c, Seq("c_custkey"))
      .select("o_orderkey", "c_name").collect().toSet
    val salted = Skew.saltedJoin(o, c, "c_custkey", col("o_orderkey"), 8)
      .select("o_orderkey", "c_name").collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salt is deterministic across evaluations") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val c = Tables.customer(spark, sf).select("c_custkey")
    val a = Skew.saltedJoin(o, c, "c_custkey", col("o_orderkey"), 4).count()
    val b = Skew.saltedJoin(o, c, "c_custkey", col("o_orderkey"), 4).count()
    assert(a == b)
  }
}
