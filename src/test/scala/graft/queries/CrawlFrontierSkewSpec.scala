package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The crawl frontier's skew contract (round 13): real frontiers are
  * power-law by host, and the old `row_number() OVER (PARTITION BY
  * host)` put a mega-host's ENTIRE queue into one window task. The
  * two-level prefix rank must (a) reproduce the window ordering
  * exactly — (n_refs DESC, url) restarting per host — and (b) split a
  * dominant host's queue across many independent rank cells, so no
  * single task ever sorts the whole queue. */
class CrawlFrontierSkewSpec extends SparkSpec {

  /** Power-law frontier: one mega-host holds ~95% of the urls (well
    * over the ≥50% bar), across varied n_refs and path shapes; six
    * small hosts pin the multi-host restart semantics. */
  private def skewed() = {
    import spark.implicits._
    val mega = (0 until 20000).map { i =>
      ("big.example.com", f"http://big.example.com/${"%04x".format(i % 4096)}/p$i%05d",
        (i % 17 + 1).toLong)
    }
    val small = (0 until 6).flatMap { h =>
      (0 until 150).map(i =>
        (s"s$h.example.com", s"http://s$h.example.com/page$i", (i % 5 + 1).toLong))
    }
    spark.createDataset(mega ++ small).toDF("host", "url", "n_refs")
      .repartition(8)
  }

  test("two-level prefix rank == per-host window row_number on a " +
    "power-law host distribution (order contract)") {
    val fr = skewed()
    val w = Window.partitionBy("host")
      .orderBy(col("n_refs").desc, col("url"))
    val windowed = fr
      .withColumn("fetch_order", row_number().over(w).cast("int"))
      .select("host", "fetch_order", "url", "n_refs")
    val ranked = CorpusBuild.frontierRank(fr)
    assert(ranked.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(ranked).isEmpty,
      "prefix rank diverged from the window ordering")
  }

  test("the mega-host's queue ranks across MANY balanced parallel " +
    "cells — no single-task sort of a dominant host (parallelism " +
    "contract), and the level-2 totals table stays tiny") {
    val fr = skewed()
    // reproduce frontierRank's cell derivation: range-partition the
    // full ordering key — each pcell is an independent window partition
    val nCells = spark.sparkContext.defaultParallelism * 4
    val cells = fr.withColumn("neg_refs", -col("n_refs"))
      .repartitionByRange(nCells, col("host"), col("neg_refs"), col("url"))
      .withColumn("pcell", spark_partition_id())
    val megaSizes = cells.where(col("host") === "big.example.com")
      .groupBy("pcell").count().collect().map(_.getLong(1))
    val megaRows = megaSizes.sum
    assert(megaSizes.length >= nCells / 2,
      s"mega-host split into only ${megaSizes.length} of $nCells rank " +
        "cells — the skew fix would still single-task a dominant host")
    // balanced: no single cell holds a dominant share of the queue
    assert(megaSizes.max < megaRows / 4,
      s"one cell holds ${megaSizes.max} of $megaRows mega-host rows")
    // the level-2 totals table (one row per (host, pcell)) is bounded
    // by #hosts + #cells — the only single-window step runs over THIS
    val totals = cells.select("host", "pcell").distinct().count()
    assert(totals <= 7 + nCells,
      s"totals table has $totals rows for 7 hosts × $nCells cells")
  }
}
