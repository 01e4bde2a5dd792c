package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SchkTest}

/** Property test for the shared two-level prefix helper: on random
  * inputs, the composed `boff + end_in_b` must equal the prefix a naive
  * single-node GLOBAL SORT would produce over the same bucket-major
  * order — i.e., the distributed two-level composition IS the global
  * prefix, for any partition/order/metric combination the four consumer
  * operators use. */
class PrefixSumPropertySpec extends SparkSpec {

  test("two-level composition equals the naive global prefix") {
    import spark.implicits._
    val row = for {
      part <- Gen.chooseNum(0, 1)     // e.g. epoch
      ord <- Gen.chooseNum(0, 3)      // e.g. bucket
      metric <- Gen.chooseNum(1, 50)  // e.g. n_tokens
      h <- Gen.chooseNum(0, 999999)
    } yield (part, ord, metric, h.toLong)
    val corpus = Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, row).map(_.zipWithIndex.map {
        case ((p, o, m, h), i) => (p, o, m, h, i.toLong)
      }))
    val prop = Prop.forAll(corpus) { rows =>
      val df = rows.toDF("part", "ord", "metric", "h", "doc_id")
      val got = PrefixSum
        .twoLevel(df, Seq("part"), Seq("ord"), col("metric"),
          Seq(col("h"), col("doc_id")))
        .select("part", "doc_id", "end_in_b", "boff")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2) + r.getLong(3)))
        .toMap
      // naive reference: per partition, sort rows bucket-major then by
      // (h, doc_id) and take the running inclusive metric sum
      val ref = rows.groupBy(_._1).flatMap { case (p, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._4, r._5))
        var acc = 0L
        sorted.map { r => acc += r._3; (p, r._5) -> acc }
      }.toMap
      got == ref
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
