package graft.lang

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The reference's real deployment model: a compiled script applied to an
  * unbounded record stream. Same Compiled value, streaming source — both
  * lowering tiers produce streaming-executable plans. */
class UdStreamingSpec extends SparkSpec {

  test("column-tier script runs over a stream (filter + project)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = """script "stream filter";
      |input  {event_id: Int, value: Float};
      |output {event_id: Int, boosted: Float};
      |if (in.value > 10.0) {
      |  out {event_id: in.event_id, boosted: in.value * 2.0};
      |}""".stripMargin
    val c = UdScript.compile(src)
    assert(c.tier == UdScript.ColumnTier)
    val input = MemoryStream[(Long, Double)]
    val q = c.run(input.toDS().toDF("event_id", "value"))
      .writeStream.format("memory").queryName("udcol").outputMode("append")
      .start()
    try {
      input.addData((1L, 5.0), (2L, 50.0), (3L, 11.0))
      q.processAllAvailable()
      val got = spark.table("udcol").as[(Long, Double)].collect().toSet
      assert(got == Set((2L, 100.0), (3L, 22.0)))
    } finally q.stop()
  }

  test("kernel-tier script runs over a stream (recursion + multi-emit)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // VARIABLE bound: not the counted-loop shape (step-k loops against
    // literal bounds lower to explode now), so this stays a true
    // kernel-tier recursion over the stream
    val src = """script "stream countdown by two";
      |input  Int;
      |output Int;
      |proc count(n: Int, lim: Int) {
      |  out n;
      |  if (n > lim) { count(n - 2, lim); }
      |}
      |count(in, 0);""".stripMargin
    val c = UdScript.compile(src)
    assert(c.tier == UdScript.KernelTier)
    val input = MemoryStream[Long]
    val q = c.run(input.toDS().toDF("value"))
      .writeStream.format("memory").queryName("udkern").outputMode("append")
      .start()
    try {
      input.addData(4L)
      q.processAllAvailable()
      input.addData(1L) // second micro-batch reuses the same kernel
      q.processAllAvailable()
      val got = spark.table("udkern").as[Long].collect().sorted
      assert(got.toSeq == Seq(-1L, 0L, 1L, 2L, 4L))
    } finally q.stop()
  }

  test("counted-loop script lowers to explode and runs over a stream") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = """script "stream countdown";
      |input  Int;
      |output Int;
      |proc count(n: Int) { out n; if (n > 0) { count(n - 1); } }
      |count(in);""".stripMargin
    val c = UdScript.compile(src)
    assert(c.tier.isInstanceOf[UdScript.LoopTier])
    val input = MemoryStream[Long]
    val q = c.run(input.toDS().toDF("value"))
      .writeStream.format("memory").queryName("udloop").outputMode("append")
      .start()
    try {
      input.addData(2L)
      q.processAllAvailable()
      input.addData(1L)
      q.processAllAvailable()
      val got = spark.table("udloop").as[Long].collect().sorted
      assert(got.toSeq == Seq(0L, 0L, 1L, 1L, 2L))
    } finally q.stop()
  }

  test("driver streaming entries equal their batch twins") {
    // same compiled script, file stream vs batch read — identical rows
    val streamed = graft.queries.UdLang.uStreamFilter(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.UdLang.uFilterMatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
