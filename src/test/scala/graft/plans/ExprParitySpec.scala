package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Generated-data parity for the custom codegen expressions: on a few
  * hundred ScalaCheck-generated rows (evaluated in ONE Spark pass each),
  * the native expressions must match a straightforward Scala reference
  * bit-for-bit — the same contract the DuckDB oracles rely on. */
class ExprParitySpec extends SparkSpec {

  private val seed = rng.Seed(20260813L)
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, seed)

  test("SqDist and DotProduct match a left-fold Scala reference") {
    import spark.implicits._
    val genArr = for {
      n  <- Gen.chooseNum(0, 12)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
    } yield xs.toSeq
    val rows = sample(Gen.zip(genArr, genArr), 300).zipWithIndex
      .collect { case ((a, b), i) if a.size == b.size => (i.toLong, a, b) }
    assert(rows.nonEmpty)
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        DotProduct.sqDist(col("a"), col("b")).as("sq"),
        DotProduct.dot(col("a"), col("b")).as("dp"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (id, a, b) =>
      var sq = 0.0; var dp = 0.0
      a.zip(b).foreach { case (x, y) => sq += (x - y) * (x - y); dp += x * y }
      val (gsq, gdp) = got(id)
      assert(java.lang.Double.compare(gsq, sq) == 0, s"sq row $id")
      assert(java.lang.Double.compare(gdp, dp) == 0, s"dot row $id")
    }
  }

  test("SortedIntersect size matches Set intersection") {
    import spark.implicits._
    val genSet = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g",
      "h", "ij", "klm", "nop", "q1", "r2")).map(_.distinct.sorted)
    val rows = sample(Gen.zip(genSet, genSet), 300).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        SortedIntersect.size(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == a.toSet.intersect(b.toSet).size, s"row $id")
    }
  }
}
