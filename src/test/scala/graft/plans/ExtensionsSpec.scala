package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The DotProductRewrite optimizer rule: users write the declarative HOF
  * idiom; the optimized plan runs the native expression. */
class ExtensionsSpec extends SparkSpec {

  private def hofDot = {
    val e = transform(col("embedding"), _.cast("double"))
    aggregate(zip_with(e, e, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)
  }

  test("HOF dot-product idiom is rewritten to graft_dot_product") {
    val df = Tables.embeddings(spark, sf).select(hofDot.as("selfdot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot_product"),
      s"rule did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"),
      "HOF form should be gone")
  }

  test("HOF squared-distance idiom is rewritten to graft_sq_dist") {
    val e = transform(col("embedding"), _.cast("double"))
    val hofSq = aggregate(zip_with(e, e, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val df = Tables.embeddings(spark, sf).select(hofSq.as("selfdist"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_sq_dist"),
      s"rule did not fire:\n$optimized")
    // self-distance is exactly zero through the native expression
    assert(df.collect().forall(_.getDouble(0) == 0.0))
  }

  test("rewrite preserves values incl. null rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(0.5, -1.0, 4.0))
    ).toDF("id", "embedding")
      .union(Seq((3L, null.asInstanceOf[Seq[Double]]))
        .toDF("id", "embedding"))
    val e = col("embedding")
    val hof = df.select(col("id"),
      aggregate(zip_with(e, e, (a, b) => a * b), lit(0.0),
        (acc, v) => acc + v).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(hof(1L) == 14.0)
    assert(hof(2L) == 17.25)
    assert(hof(3L) == null)
  }

  test("unequal-length arrays null out, matching zip_with padding") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val viaRule = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v).as("d")).collect()(0)
    assert(viaRule.isNullAt(0))
    val direct = df.select(DotProduct.dot(col("a"), col("b")).as("d"))
      .collect()(0)
    assert(direct.isNullAt(0))
  }
}
