package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order interleave (plans/ZOrder.scala) and the layout_zorder entry:
  * expression == 20-term SQL bit formula (the oracle's form), reference
  * fold parity, and the pruning property the layout exists for. */
class ZOrderSpec extends SparkSpec {

  private def refInterleave(x: Long, y: Long): Long = {
    var z = 0L
    (0 until 32).foreach { i =>
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave equals the bit-by-bit reference fold") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 0L), (0L, 1023L),
      (1023L, 1023L), (675L, 413L), (0xFFFFFFFFL, 0x12345678L))
    cases.foreach { case (x, y) =>
      assert(org.apache.spark.sql.graft.ZInterleaveExpr.interleave(x, y) ==
        refInterleave(x, y), s"($x, $y)")
    }
  }

  test("column expression equals the 20-term SQL formula on a 10-bit " +
    "grid (codegen path)") {
    import spark.implicits._
    val grid = (0 until 2000).map(i => ((i * 131) % 1024L, (i * 257) % 1024L))
    val sqlFormula = graft.queries.Layout.zFormulaSql("x", "y")
    val mismatches = grid.toDF("x", "y")
      .withColumn("z_expr", ZOrder.interleave(col("x"), col("y")))
      .withColumn("z_sql", expr(sqlFormula))
      .where(col("z_expr") =!= col("z_sql"))
      .count()
    assert(mismatches == 0)
  }

  test("z-order monotone on each axis within the other's cell") {
    // within one y cell, zval strictly increases with x (and vice versa)
    val f = org.apache.spark.sql.graft.ZInterleaveExpr.interleave _
    (0L until 63L).foreach { x =>
      assert(f(x, 7L) < f(x + 1, 7L))
      assert(f(7L, x) < f(7L, x + 1))
    }
  }

  test("zone map: serve answers from the artifacts, stats agree with " +
    "the pruned scan, and both boxes skip most files") {
    import graft.queries.Layout
    graft.sinks.ArtifactStore.remove(spark, Layout.zmKey(spark, sf, "table"))
    graft.sinks.ArtifactStore.remove(spark, Layout.zmKey(spark, sf, "stats"))
    val built = Layout.zonemapBuild(spark, sf).collect()
    assert(built.length == 32)
    assert(built.map(_.getAs[Long]("cnt")).sum == 1000L)
    val served = Layout.zonemapServe(spark, sf).collect()
    assert(served.length == 2)
    served.foreach { r =>
      // the stats artifact and the actual pruned scan must agree row
      // for row — a drift means the table artifact and its zone map
      // come from different builds
      assert(r.getAs[Long]("rows_scanned") == r.getAs[Long]("stat_rows"))
      assert(r.getAs[Long]("files_hit") < 32)
      assert(r.getAs[Long]("rows_matched") <= r.getAs[Long]("rows_scanned"))
    }
    // serve twice == stable (pure artifact reads)
    assert(Layout.zonemapServe(spark, sf).collect().toSeq == served.toSeq)
  }

  test("layout_zorder: z-layout prunes both boxes; single-axis layouts " +
    "are blind on their off axis") {
    val rows = graft.queries.Layout.layoutZorder(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("zorder", "time_sorted", "user_sorted"))
    val z = rows("zorder")
    val t = rows("time_sorted")
    val u = rows("user_sorted")
    assert(z.getAs[Long]("files") == 32)
    // z-order strictly beats each single-axis layout on its blind axis,
    // with real headroom (theory: ~8 of 32 for a 10%-wide box)
    assert(z.getAs[Long]("hits_user_box") <= 16)
    assert(z.getAs[Long]("hits_time_box") <= 16)
    assert(z.getAs[Long]("hits_user_box") < t.getAs[Long]("hits_user_box"))
    assert(z.getAs[Long]("hits_time_box") < u.getAs[Long]("hits_time_box"))
    // and the single-axis layouts prune their own axis perfectly
    assert(t.getAs[Long]("hits_time_box") <= 8)
    assert(u.getAs[Long]("hits_user_box") <= 8)
    // ntile keeps files balanced (sizes differ by at most 1)
    Seq(z, t, u).foreach { r =>
      assert(r.getAs[Long]("max_file_rows") -
        r.getAs[Long]("min_file_rows") <= 1)
    }
  }
}
