package graft.sources

import graft.lang.Ast._
import graft.lang.UdScript
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON record ingest/egress — the reference's wire-format story (§1.4):
  * msgpack framing is delegated to lift/lower companions; JSON is the MVP
  * format (roadmap.md:25-26). Here: JSON-lines ⇄ DataFrame with the
  * DECLARED uDLang input type as the schema (no inference, ever), the
  * validation modes of ValidatedIngest, and absent-vs-null preservation.
  *
  * Absent vs null (README.md:220-228, SURVEY §7.4 hard part #2):
  * `blocker?: U32` (absent-optional) and `blocker: U32?` (nullable) both
  * surface as nullable columns after from_json — so for every
  * absent-optional field we add a presence column `<name>__present` =
  * whether the key exists in the payload. `rec.?.field` (Has) then means
  * presence, not non-null, exactly as the reference distinguishes them.
  */
object JsonRecords {

  /** Key-presence probe: true iff the JSON object has the key (even if
    * its value is null) — json_object_keys distinguishes what from_json
    * cannot. */
  def hasField(payload: Column, name: String): Column =
    coalesce(array_contains(json_object_keys(payload), name), lit(false))

  /** Parse a JSON-lines Dataset under a declared uDLang record type.
    * Output columns = declared fields (+ `__present` flags for
    * absent-optional ones). Malformed payloads follow `mode`. */
  def read(s: SparkSession, lines: Dataset[String], declared: TRecord,
           mode: ValidatedIngest.Mode): ValidatedIngest.Validated = {
    val schema: StructType = UdScript.schemaOf(declared)
    val raw = lines.toDF("_payload")
    val v = ValidatedIngest.validate(raw,
      Seq(ValidatedIngest.jsonParses("_payload", schema)), mode)
    val parsed = v.good
      .withColumn("_rec", from_json(col("_payload"), schema))
    val cols =
      declared.fields.map(f => col(s"_rec.${f.name}").as(f.name)) ++
        declared.fields.filter(_.absentOptional).map(f =>
          hasField(col("_payload"), f.name).as(s"${f.name}__present"))
    ValidatedIngest.Validated(parsed.select(cols: _*), v.bad)
  }

  /** Write a DataFrame as JSON-lines strings (egress lowering). */
  def toJsonLines(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.map(col).toSeq: _*))).as[String]
  }
}
