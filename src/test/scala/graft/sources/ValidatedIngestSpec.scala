package graft.sources

import graft.SparkSpec
import graft.sources.ValidatedIngest._
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ValidatedIngestSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    Seq(
      (1L, "click", 5.0, """{"k": 1}"""),
      (2L, "BOGUS", 5.0, """{"k": 2}"""),          // bad enum
      (3L, "view", -7.0, """{"k": 3}"""),          // out of range
      (4L, "view", 5.0, """not json"""),           // malformed payload
      (5L, "error", 5.0, """{"k": 5}""")
    ).toDF("event_id", "event_type", "value", "props")
  }

  private val rules = Seq(
    enumCheck("event_type", Seq("click", "view", "purchase", "signup", "error")),
    rangeCheck("value", 0.0, 1000.0),
    jsonParses("props", StructType(Seq(StructField("k", LongType)))))

  test("Dlq mode routes each invalid record with its first failing reason") {
    val v = validate(sample, rules, Dlq)
    assert(v.good.select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 5L))
    val bad = v.bad.select("event_id", "_invalid_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bad(2L).startsWith("bad_enum:event_type=BOGUS"))
    assert(bad(3L).startsWith("out_of_range:value="))
    assert(bad(4L).startsWith("malformed_json:props"))
  }

  test("Skip mode drops invalid records silently") {
    val v = validate(sample, rules, Skip)
    assert(v.good.count() == 2)
    assert(v.bad.isEmpty)
  }

  test("Abort mode fails the job on the first invalid record") {
    val v = validate(sample, rules, Abort)
    val e = intercept[Exception] { v.good.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("bad_enum")))
  }

  test("Abort mode passes a fully valid input through untouched") {
    val valid = sample.filter(col("event_id").isin(1L, 5L))
    val v = validate(valid, rules, Abort)
    assert(v.good.count() == 2)
    assert(v.good.columns.toSeq ==
      Seq("event_id", "event_type", "value", "props"))
  }
}
