package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SqDistExpr must be a drop-in for the aggregate/zip_with HOF idiom —
  * same values (same left-fold order), same null semantics — since the
  * DuckDB oracles replay the HOF arithmetic. */
class SqDistSpec extends SparkSpec {

  test("sqDist equals the HOF formulation on mixed arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(0.5, 2.0, -1.0)),
      (2L, Seq(0.0, 0.0), Seq(0.0, 0.0)),
      (3L, Seq(1e-9, 1e9, -1e9, 0.123456), Seq(-1e-9, 1e9, 1e9, 0.6)),
      (4L, Seq.empty[Double], Seq.empty[Double])
    ).toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(col("id"),
      DotProduct.sqDist(col("a"), col("b")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(
        r.getDouble(1), r.getDouble(2)) == 0, s"row $r")
    }
  }

  test("sqDist nulls on null arrays, null elements, and length mismatch") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1, array(1.0D, 2.0D), CAST(NULL AS ARRAY<DOUBLE>)),
        |  (2, array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)),
        |  (3, array(1.0D), array(1.0D, 2.0D))
        |AS t(id, a, b)""".stripMargin)
    val got = df.select(DotProduct.sqDist(col("a"), col("b"))).collect()
    assert(got.forall(_.isNullAt(0)), "all edge cases must yield NULL")
  }
}
