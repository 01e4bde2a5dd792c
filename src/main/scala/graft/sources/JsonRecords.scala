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
    * time from the value's JSON type — the payload is parsed ONCE into a
    * VARIANT and each branch tests schema_of_variant (exact: a quoted
    * "42" is STRING, never Int; an array never matches a Str branch).
    * The FIRST matching branch in declared order wins. Extraction is a
    * type-aligned variant cast, so no branch re-parses the payload —
    * from_json probes were one Jackson parse PER BRANCH per row.
    * Returns (tagged-struct column, inferred-tag column, present-and-
    * non-null probe); a JSON-null or missing key yields a null union. */
  def unionParse(payload: Column, name: String, ts: Seq[UdType])
      : (Column, Column, Column) = {
    val vg = variant_get(try_parse_json(payload), s"$$.$name", "variant")
    val sv = schema_of_variant(vg)
    def typeMatches(bt: UdType): Column = bt match {
      case TInt | TIntN(_, _) => sv === "BIGINT"
      case TFloat => sv === "DOUBLE" || sv.startsWith("DECIMAL")
      case TStr   => sv === "STRING"
      case TBool  => sv === "BOOLEAN"
      case TValue(s) => sv === "STRING" &&
        try_variant_get(vg, "$", "string") === s
      case TList(_)  => sv.startsWith("ARRAY")
      case TRecord(_, _) | TPoint | TMap(_) => sv.startsWith("OBJECT")
      case _ => lit(false)
    }
    val tag = coalesce(ts.map(bt =>
      when(typeMatches(bt), lit(UdScript.tagOf(bt)))): _*)
    val slots = ts.zipWithIndex.map { case (bt, i) =>
      val dt = UdScript.sparkType(bt)
      when(tag === lit(UdScript.tagOf(bt)),
        try_variant_get(vg, "$", dt.catalogString))
        .otherwise(lit(null).cast(dt)).as(s"v$i")
    }
    val presentNonNull = vg.isNotNull &&
      !coalesce(is_variant_null(vg), lit(false))
    (when(tag.isNotNull, struct(tag.as("_tag") +: slots: _*)), tag,
      presentNonNull)
  }

  /** Does t contain a NESTED record with absent-optional fields (whose
    * presence flags live inside the struct)? Lists are out of scope —
    * per-element presence has no column to live in. */
  private def hasNestedPresence(t: UdType): Boolean = t match {
    case TRecord(fs, _) =>
      fs.exists(_.absentOptional) || fs.exists(f => hasNestedPresence(f.t))
    case TOption(x) => hasNestedPresence(x)
    case _ => false
  }

  /** Rebuild a nested record column with its in-struct __present flags
    * populated from the variant (key present ⟺ variant_get non-null,
    * even for a JSON-null value). Recurses through nested records. */
  private def withNestedPresence(pv: Column, base: Column, path: String,
                                 t: UdType): Column = t match {
    case TOption(x) => withNestedPresence(pv, base, path, x)
    case TRecord(fs, _) =>
      val parts = fs.map { f =>
        withNestedPresence(pv, base.getField(f.name), s"$path.${f.name}",
          f.t).as(f.name)
      } ++ fs.filter(_.absentOptional).map { f =>
        variant_get(pv, s"$path.${f.name}", "variant").isNotNull
          .as(s"${f.name}__present")
      }
      when(base.isNotNull, struct(parts: _*))
    case _ => base
  }

  /** General (non-enum) union branches of a declared field, if any. */
  private def unionBranches(t: UdType): Option[Seq[UdType]] = t match {
    case TUnion(ts) if !ts.forall(_.isInstanceOf[TValue]) => Some(ts)
    case TOption(inner) => unionBranches(inner)
    case _ => None
  }

  /** Parse a JSON-lines Dataset under a declared uDLang record type.
    * Output columns = declared fields (+ `__present` flags for
    * absent-optional ones). Malformed payloads follow `mode`.
    *
    * Everything — data columns, union tag inference, and the invalid
    * reason — is computed in ONE projection so Spark's subexpression
    * elimination evaluates each from_json probe once per row; splitting
    * the rules into a separate operator re-parsed the payload per rule. */
  def read(s: SparkSession, lines: Dataset[String], declared: TRecord,
           mode: ValidatedIngest.Mode): ValidatedIngest.Validated = {
    val schema: StructType = UdScript.schemaOf(declared)
    val raw = lines.toDF("_payload")
    val payload = col("_payload")
    val unionFields = declared.fields.flatMap(f =>
      unionBranches(f.t).map(f.name -> _))
    val unions: Map[String, (Column, Column, Column)] = unionFields.map {
      case (n, ts) => n -> unionParse(payload, n, ts)
    }.toMap
    val rec = from_json(payload, schema)
    lazy val pv = try_parse_json(payload)
    val dataCols =
      declared.fields.map { f =>
        unions.get(f.name) match {
          case Some((structCol, _, _)) => structCol.as(f.name)
          case None if hasNestedPresence(f.t) =>
            withNestedPresence(pv, rec.getField(f.name), s"$$.${f.name}",
              f.t).as(f.name)
          case None => rec.getField(f.name).as(f.name)
        }
      } ++
        declared.fields.filter(_.absentOptional).map(f =>
          hasField(payload, f.name).as(s"${f.name}__present"))
    // type-safe by default: a PRESENT, non-null value that fails its
    // declared field type (from_json is strict, so the parsed field is
    // null exactly then) is an invalid record, not a silent null — the
    // same posture as the msgpack decoder's coerce errors
    val typeChecks = declared.fields
      .filterNot(f => unions.contains(f.name)).map { f =>
        val vg = variant_get(pv, s"$$.${f.name}", "variant")
        val presentNonNull = vg.isNotNull &&
          !coalesce(is_variant_null(vg), lit(false))
        when(presentNonNull && rec.getField(f.name).isNull,
          lit(s"type:${f.name}"))
      }
    // string-literal enums (ValueType unions) are a CHECK constraint at
    // ingest (README.md:218): a value outside the declared literals is
    // an invalid record
    def enumLits(t: UdType): Option[Seq[String]] = t match {
      case TUnion(ts) if ts.nonEmpty && ts.forall(_.isInstanceOf[TValue]) =>
        Some(ts.collect { case TValue(s) => s })
      case TOption(x) => enumLits(x)
      case _ => None
    }
    val enumChecks = declared.fields.flatMap(f => enumLits(f.t).map { lits =>
      val c = rec.getField(f.name)
      when(c.isNotNull && !c.isin(lits: _*), lit(s"bad_enum:${f.name}"))
    })
    // sized-int declared ranges are boundary checks too (same posture as
    // the msgpack decoder): out-of-range values route by mode
    def sizedInt(t: UdType): Option[TIntN] = t match {
      case n: TIntN   => Some(n)
      case TOption(x) => sizedInt(x)
      case _          => None
    }
    val rangeChecks = declared.fields.flatMap(f => sizedInt(f.t).map { n =>
      val c = rec.getField(f.name)
      when(c.isNotNull && (c < n.lo || c > n.hi), lit(s"range:${f.name}"))
    })
    // a REQUIRED field (neither absent-optional nor T?) must be present
    // and non-null — the msgpack decoder's missing:<f> posture, extended
    // with null:<f> for an explicit JSON null
    val requiredChecks = declared.fields
      .filterNot(f => f.absentOptional || f.t.isInstanceOf[TOption]).map { f =>
        val vg = variant_get(pv, s"$$.${f.name}", "variant")
        when(vg.isNull, lit(s"missing:${f.name}"))
          .when(coalesce(is_variant_null(vg), lit(false)),
            lit(s"null:${f.name}"))
      }
    val reason = coalesce(
      (when(get_json_object(payload, "$").isNull,
        lit("malformed_json:_payload")) +:
        unionFields.map { case (n, _) =>
          val (_, tag, presentNonNull) = unions(n)
          when(presentNonNull && tag.isNull, lit(s"union_no_branch:$n"))
        }) ++ typeChecks ++ enumChecks ++ rangeChecks ++ requiredChecks: _*)
    val tagged = raw.select(
      (payload +: dataCols) :+ reason.as("_invalid_reason"): _*)
    val routed = ValidatedIngest.routeTagged(tagged, mode)
    ValidatedIngest.Validated(routed.good.drop("_payload"),
      if (routed.bad.columns.isEmpty) routed.bad
      else routed.bad.select(col("_payload"), col("_invalid_reason")))
  }

  /** Write a DataFrame as JSON-lines strings (egress lowering). */
  def toJsonLines(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.map(col).toSeq: _*))).as[String]
  }
}
