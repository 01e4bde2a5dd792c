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
