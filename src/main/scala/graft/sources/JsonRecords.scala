package graft.sources

import graft.lang.Ast._
import graft.lang.UdScript
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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

  /** True union INGEST (manual.md:112-115): a declared `Int | Str` field
    * arrives as its RAW JSON value, and the tag is inferred at validation
    * time — each branch's Spark type probes the payload independently
    * (from_json is strict per branch: a quoted "42" does NOT match Int),
    * and the FIRST matching branch in declared order wins. Str coerces
    * any scalar, so a Str branch acts as a catch-all for everything after
    * it — declared order IS the precedence, same as the kernel decoder.
    * Returns (tagged-struct column, inferred-tag column); a JSON-null or
    * missing key yields a null union (tag null). */
  def unionParse(payload: Column, name: String, ts: Seq[UdType])
      : (Column, Column) = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
    def probe(dt: org.apache.spark.sql.types.DataType): Column =
      from_json(payload, StructType(Seq(StructField(name, dt))))
        .getField(name)
    // from_json(StringType) coerces arrays/objects to their raw JSON
    // text, so a Str branch needs a complex-value guard: a real JSON
    // array/object parses under the strict complex probes, a QUOTED
    // "[1,2]" string does not
    lazy val isComplex = probe(ArrayType(StringType)).isNotNull ||
      probe(MapType(StringType, StringType)).isNotNull
    val branches = ts.map { bt =>
      val c = probe(UdScript.sparkType(bt))
      val matched = bt match {
        case TStr => c.isNotNull && !isComplex
        case _    => c.isNotNull
      }
      (c, matched)
    }
    val tag = coalesce(ts.zip(branches).map { case (bt, (_, m)) =>
      when(m, lit(UdScript.tagOf(bt)))
    }: _*)
    val slots = ts.zipWithIndex.map { case (bt, i) =>
      when(tag === lit(UdScript.tagOf(bt)), branches(i)._1)
        .otherwise(lit(null).cast(UdScript.sparkType(bt))).as(s"v$i")
    }
    (when(tag.isNotNull, struct(tag.as("_tag") +: slots: _*)), tag)
  }

  /** Validation rule: a PRESENT, non-null union value must match some
    * branch — otherwise the record is invalid (tag inference happens at
    * validation time, so a no-branch value is a mode-routed error, not a
    * silent null). */
  def unionMatches(payload: String, name: String, ts: Seq[UdType])
      : ValidatedIngest.Rule = _ => {
    val (_, tag) = unionParse(col(payload), name, ts)
    when(hasField(col(payload), name) &&
      get_json_object(col(payload), s"$$.$name").isNotNull && tag.isNull,
      lit(s"union_no_branch:$name"))
  }

  /** General (non-enum) union branches of a declared field, if any. */
  private def unionBranches(t: UdType): Option[Seq[UdType]] = t match {
    case TUnion(ts) if !ts.forall(_.isInstanceOf[TValue]) => Some(ts)
    case TOption(inner) => unionBranches(inner)
    case _ => None
  }

  /** Parse a JSON-lines Dataset under a declared uDLang record type.
    * Output columns = declared fields (+ `__present` flags for
    * absent-optional ones). Malformed payloads follow `mode`. */
  def read(s: SparkSession, lines: Dataset[String], declared: TRecord,
           mode: ValidatedIngest.Mode): ValidatedIngest.Validated = {
    val schema: StructType = UdScript.schemaOf(declared)
    val raw = lines.toDF("_payload")
    val unionFields = declared.fields.flatMap(f =>
      unionBranches(f.t).map(f.name -> _))
    val v = ValidatedIngest.validate(raw,
      ValidatedIngest.jsonParses("_payload", schema) +:
        unionFields.map { case (n, ts) => unionMatches("_payload", n, ts) },
      mode)
    val parsed = v.good
      .withColumn("_rec", from_json(col("_payload"), schema))
    val unionByName = unionFields.toMap
    val cols =
      declared.fields.map { f =>
        unionByName.get(f.name) match {
          case Some(ts) => unionParse(col("_payload"), f.name, ts)._1.as(f.name)
          case None     => col(s"_rec.${f.name}").as(f.name)
        }
      } ++
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
