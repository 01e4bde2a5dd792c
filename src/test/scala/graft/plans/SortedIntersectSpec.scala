package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectSpec extends SparkSpec {
  test("merge-walk intersect size matches array_intersect on random input") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(_.toString)
    val rows = (1 to 200).map { i =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(20) + 1).sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(20) + 1).sorted
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      SortedIntersect.size(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"row ${r.getInt(0)}")
    }
    // null array → null
    val n = df.limit(1).select(
      SortedIntersect.size(lit(null).cast("array<string>"), col("b")))
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
