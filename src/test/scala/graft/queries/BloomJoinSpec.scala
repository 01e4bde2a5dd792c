package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q_bloom_join's correctness contract: the Bloom is ONLY an admission
  * filter — the exact confirm join carries correctness, so results are
  * identical to the plain join at ANY false-positive rate. */
class BloomJoinSpec extends SparkSpec {

  test("bloom-prefiltered join == plain join even with a deliberately " +
    "tiny (high-FPR) filter") {
    val sel = Tables.orders(spark, sf)
      .where(col("o_totalprice") < 20000)
      .select(col("o_orderkey"), col("o_orderdate"))
    // absurdly small: 64 bits for ~50 keys → FPR near 1, the worst case
    val bf = sel.agg(graft.plans.Bloom
      .agg(xxhash64(col("o_orderkey")), 1024L, 64L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val pre = li.where(graft.plans.Bloom.mightContain(lit(bf),
      xxhash64(col("l_orderkey"))))
    val viaBloom = pre.join(sel, pre("l_orderkey") === sel("o_orderkey"))
      .select("l_orderkey", "l_extendedprice")
    val plain = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
      .select("l_orderkey", "l_extendedprice")
    assert(viaBloom.exceptAll(plain).isEmpty &&
      plain.exceptAll(viaBloom).isEmpty)
  }

  test("the production-size filter admits a small fact fraction (the " +
    "reduction is real, not vacuous)") {
    val sel = Tables.orders(spark, sf)
      .where(col("o_totalprice") < 20000)
      .select("o_orderkey")
    val items = math.max(1024L, sel.count())
    val bf = sel.agg(graft.plans.Bloom
      .agg(xxhash64(col("o_orderkey")), items, items * 16).as("bf"))
      .head().getAs[Array[Byte]](0)
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
    val admitted = li.where(graft.plans.Bloom.mightContain(lit(bf),
      xxhash64(col("l_orderkey")))).count()
    val total = li.count()
    // ~4% of orders qualify; admitted fact rows must stay well under
    // a quarter of the table even with Bloom false positives
    assert(admitted < total / 4, s"admitted $admitted of $total")
  }
}
