package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch aggregates (plans/SketchAggs.scala): register/counter/minima
  * equality against independent in-memory folds, merge semantics across
  * partitions, and the query-pack invariants the oracles rely on. */
class SketchSpec extends SparkSpec {

  import graft.Tables

  private def h52(x: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 13), 16)

  private lazy val keys: Seq[String] = (0 until 5000).map(i => s"key_$i")

  test("HLL registers equal the sequential fold, independent of " +
    "partitioning") {
    import spark.implicits._
    val p = 10
    val m = 1 << p
    // reference fold
    val ref = new Array[Int](m)
    keys.foreach { k =>
      val h = h52(k)
      val j = (h & (m - 1)).toInt
      val w = h >>> p
      val rho = if (w == 0L) 43
        else 42 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > ref(j)) ref(j) = rho
    }
    for (parts <- Seq(1, 7)) {
      val got = keys.toDF("k").repartition(parts)
        .select(expr("CAST(conv(substr(md5(k),1,13),16,10) AS BIGINT)").as("h"))
        .agg(Sketch.hll(col("h"), p).as("regs"))
        .head().getSeq[Int](0)
      assert(got == ref.toSeq, s"parts=$parts")
    }
  }

  test("HLL estimate lands within the published error bound (~3.3% at " +
    "m=1024, generous 5x margin)") {
    import spark.implicits._
    val est = keys.toDF("k")
      .select(expr("CAST(conv(substr(md5(k),1,13),16,10) AS BIGINT)").as("h"))
      .agg(Sketch.hll(col("h"), 10).as("regs"))
      .select(expr(
        "0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * 8796093022208.0" +
          " / CAST(aggregate(regs, 0L, (a, r) -> a + shiftleft(1L, 43 - r))" +
          " AS DOUBLE)"))
      .head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.165, s"est=$est")
  }

  test("CMS counters equal the sequential fold and never underestimate") {
    import spark.implicits._
    val d = 4
    val w = 512
    val items = (0 until 2000).map(i => s"tok_${i % 97}") // skewed freqs
    val ref = new Array[Long](d * w)
    items.foreach { t =>
      (0 until d).foreach { r =>
        ref(r * w + (h52(s"cms${r}_$t") % w).toInt) += 1L
      }
    }
    val hs = (0 until d).map(r => expr(
      s"CAST(conv(substr(md5(concat('cms${r}_', t)),1,13),16,10) AS BIGINT)" +
        s" % $w"))
    // weighted (combine-then-sketch) path == unweighted instance fold
    val got = items.toDF("t").repartition(5)
      .groupBy("t").agg(count(lit(1)).as("n"))
      .withColumn("hs", array(hs: _*))
      .agg(Sketch.cms(col("hs"), col("n"), d, w).as("c"))
      .head().getSeq[Long](0)
    assert(got == ref.toSeq)
    // point estimates >= true counts
    val trueCnt = items.groupBy(identity).view.mapValues(_.size.toLong)
    trueCnt.foreach { case (t, n) =>
      val est = (0 until d)
        .map(r => got(r * w + (h52(s"cms${r}_$t") % w).toInt)).min
      assert(est >= n, s"$t: est=$est < $n")
    }
  }

  test("KMV keeps the k smallest DISTINCT hashes, merge == global fold") {
    import spark.implicits._
    val k = 64
    val withDups = keys.take(1000) ++ keys.take(300) // duplicates
    val ref = withDups.map(h52).distinct.sorted.take(k)
    for (parts <- Seq(1, 9)) {
      val got = withDups.toDF("t").repartition(parts)
        .select(expr("CAST(conv(substr(md5(t),1,13),16,10) AS BIGINT)").as("h"))
        .agg(Sketch.kmv(col("h"), k).as("mins"))
        .head().getSeq[Long](0)
      assert(got == ref, s"parts=$parts")
    }
  }

  test("KMV below k is the exact distinct set") {
    import spark.implicits._
    val got = keys.take(20).toDF("t")
      .select(expr("CAST(conv(substr(md5(t),1,13),16,10) AS BIGINT)").as("h"))
      .agg(Sketch.kmv(col("h"), 256).as("mins"))
      .head().getSeq[Long](0)
    assert(got == keys.take(20).map(h52).sorted)
  }

  test("HLL cube: serving from the merged cell artifact equals the " +
    "direct per-language sketch, and reload equals rebuild") {
    import graft.queries.Sketches
    val key = Sketches.cubeKey(spark, sf)
    graft.sinks.ArtifactStore.remove(spark, key)
    val cold = Sketches.hllCubeServe(spark, sf).collect() // builds+commits
    val warm = Sketches.hllCubeServe(spark, sf).collect() // pure load
    assert(cold.toSeq == warm.toSeq)
    // merged rollup == direct whole-partition sketch (register max is
    // associative over any grouping)
    val direct = Sketches.hllShingles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("v_zero"),
        r.getAs[Long]("s_scaled"), r.getAs[Long]("est_micro")))).toMap
    warm.foreach { r =>
      assert(direct(r.getString(0)) == ((r.getAs[Long]("v_zero"),
        r.getAs[Long]("s_scaled"), r.getAs[Long]("est_micro"))),
        s"lang=${r.getString(0)}")
    }
  }

  test("sketch entries run green at sf0.001 and land near the exact " +
    "counts computed OUTSIDE the entries (the twins the 100x tier " +
    "evicted from the plans)") {
    import graft.queries.Sketches
    // exact per-language distinct shingles, computed here — NOT in the
    // entry, where a count(DISTINCT) would shuffle the key universe
    val exactByLang = Sketches.shingles(spark, sf)
      .groupBy("lang").agg(countDistinct(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hll = Sketches.hllShingles(spark, sf).collect()
    assert(hll.nonEmpty)
    hll.foreach { r =>
      val exact = exactByLang(r.getString(0))
      val est = r.getAs[Long]("est_micro").toDouble / 1e6
      assert(est > 0 && math.abs(est - exact) / math.max(exact, 1L) < 0.5,
        s"lang=${r.getString(0)} exact=$exact est=$est")
    }
    val cms = Sketches.cmsTopk(spark, sf).collect()
    assert(cms.length == 15)
    assert(cms.forall(_.getAs[Boolean]("ge_ok")))
    // exact per-side distincts and intersection for the KMV pins
    val sides = Sketches.shingles(spark, sf)
      .withColumn("side", col("doc_id") % 2)
      .select("side", "s").distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getString(1)).toSet
      }
    val (sa, sb) = (sides(0L), sides(1L))
    val kmv = Sketches.kmvIntersect(spark, sf).collect()
    assert(kmv.length == 1)
    val row = kmv.head
    def rel(estMicro: Long, exact: Int): Double =
      math.abs(estMicro / 1e6 - exact) / math.max(exact, 1)
    assert(rel(row.getAs[Long]("est_a_micro"), sa.size) < 0.35,
      s"a: est=${row.getAs[Long]("est_a_micro") / 1e6} exact=${sa.size}")
    assert(rel(row.getAs[Long]("est_b_micro"), sb.size) < 0.35,
      s"b: est=${row.getAs[Long]("est_b_micro") / 1e6} exact=${sb.size}")
    val exactInter = sa.intersect(sb).size
    assert(math.abs(row.getAs[Long]("inter_est_micro") / 1e6 - exactInter)
      <= math.max(0.5 * exactInter, 64.0),
      s"inter: est=${row.getAs[Long]("inter_est_micro") / 1e6} " +
        s"exact=$exactInter")
  }
}
