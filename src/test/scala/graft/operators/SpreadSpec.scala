package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** Pins the two sides of Spread.forCpu's contract:
  *  - an under-split input (1 partition < cores) GAINS the spread —
  *    the CPU-bound parse must not single-thread;
  *  - an already-spread input (≥ cores partitions) passes through
  *    IDENTICALLY — no Exchange in the physical plan, because at crawl
  *    scale that exchange would ship the full raw corpus and REDUCE
  *    parallelism to cores-many oversized partitions. */
class SpreadSpec extends SparkSpec {

  private def plan[T](ds: Dataset[T]): String =
    ds.queryExecution.executedPlan.toString

  test("one-split input spreads to defaultParallelism") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val one = spark.range(100).map(_.toString).repartition(1)
    assert(one.rdd.getNumPartitions == 1)
    val spread = Spread.forCpu(one)
    assert(spread.rdd.getNumPartitions == par)
  }

  test("already-spread input passes through with NO added exchange " +
    "and unchanged partitioning") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).map(_.toString).repartition(par + 3)
    val out = Spread.forCpu(wide)
    // identity: same Dataset object, so mapPartitions over it plans no
    // exchange beyond what the input itself carries
    assert(out eq wide)
    assert(out.rdd.getNumPartitions == par + 3)
    val downstream = out.mapPartitions(it => it.map(_.length))
    // exactly the input's own round-robin exchange, none added on top
    val exchanges = "Exchange".r.findAllIn(plan(downstream)).size
    assert(exchanges == "Exchange".r.findAllIn(plan(wide)).size)
  }

  test("boundary: exactly cores-many splits does not re-exchange") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val exact = spark.range(100).map(_.toString).repartition(par)
    assert(Spread.forCpu(exact) eq exact)
  }

  test("streaming: the per-micro-batch spread exchange is BATCH-own-" +
    "bytes — flat across batches, never cumulative (the round-12 " +
    "adjudicated caveat, now a contract)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val metrics = new graft.BenchMetrics
    spark.sparkContext.addSparkListener(metrics)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = Spread.forCpu(input.toDS())
      .mapPartitions(it => it.map(_.length))
      .writeStream.format("memory").queryName("spread_probe")
      .outputMode("append").start()
    def batchShuffle(rows: Seq[String]): Long = {
      input.addData(rows: _*)
      q.processAllAvailable()
      Thread.sleep(50) // listener-bus delivery lag (BenchMetrics idiom)
      metrics.mark().writeB
    }
    try {
      val payload = (0 until 500).map(i => s"doc_$i" * 8)
      val w0 = metrics.mark().writeB
      val w1 = batchShuffle(payload)
      val w2 = batchShuffle(payload)
      val w3 = batchShuffle(payload)
      val (b1, b2, b3) = (w1 - w0, w2 - w1, w3 - w2)
      // each batch DOES spread (the exchange exists)...
      assert(b1 > 0, "expected the spread exchange on batch 1")
      // ...and every later batch exchanges only ITS OWN rows: identical
      // payloads must shuffle (near-)identical bytes — a cumulative
      // re-exchange of stream history would grow linearly per batch
      assert(b2 <= b1 * 2 && b3 <= b1 * 2,
        s"per-batch shuffle grew: $b1 / $b2 / $b3 bytes — the spread is " +
          "re-exchanging more than the batch's own rows")
      // and the bytes are the batch's payload scale, not corpus scale
      val payloadBytes = payload.map(_.length.toLong).sum
      assert(b1 < payloadBytes * 4,
        s"batch shuffle $b1 B is not batch-own-scale ($payloadBytes B payload)")
    } finally {
      q.stop()
      spark.sparkContext.removeSparkListener(metrics)
    }
  }

  test("streaming input spreads without probing (.rdd is illegal on an " +
    "unstarted stream) — the u_stream_html ingest path") {
    import spark.implicits._
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .selectExpr("CAST(value AS STRING)").as[String]
    val out = Spread.forCpu(stream) // must not throw
    assert(out.isStreaming)
    assert(out.queryExecution.logical.toString.contains("Repartition"))
  }
}
