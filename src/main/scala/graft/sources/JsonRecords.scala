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
    * Split into two halves so each can be pinned once per row (see
    * read): `unionTag` infers the branch from the extracted variant
    * value `vg`, and `unionStruct` builds the tagged struct from the
    * MATERIALIZED (vg, tag) pair — so the schema probes are not
    * re-inlined into every struct slot and validation check.
    * A JSON-null or missing key yields a null union. */
  def unionTag(vg: Column, ts: Seq[UdType]): Column = {
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
    coalesce(ts.map(bt =>
      when(typeMatches(bt), lit(UdScript.tagOf(bt)))): _*)
  }

  def unionStruct(vg: Column, tag: Column, ts: Seq[UdType]): Column = {
    val slots = ts.zipWithIndex.map { case (bt, i) =>
      val dt = UdScript.sparkType(bt)
      when(tag === lit(UdScript.tagOf(bt)),
        try_variant_get(vg, "$", dt.catalogString))
        .otherwise(lit(null).cast(dt)).as(s"v$i")
    }
    when(tag.isNotNull, struct(tag.as("_tag") +: slots: _*))
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

  /** Can every field of the declared record be extracted STRICTLY from
    * the variant parse alone? Scalars, enums and unions qualify; nested
    * records / lists / maps keep the from_json path (their leaf-level
    * strictness is Jackson's, and per-element presence lives there). */
  private def flatExtractable(t: UdType): Boolean = t match {
    case TInt | TIntN(_, _) | TFloat | TFloat32 | TStr | TBool => true
    case TOption(x) => flatExtractable(x)
    case TUnion(ts) if ts.forall(_.isInstanceOf[TValue]) => true // enum
    case TUnion(_) => true // general unions use the variant machinery
    case _ => false
  }

  /** Strict scalar extraction from a variant value: the JSON type must
    * MATCH the declared type (same posture as the msgpack decoder's
    * typed coerce — a quoted "42" never populates an Int field, an int
    * never populates a Str field; a Float accepts any JSON number). A
    * type mismatch extracts null, which the type:<f> check then routes
    * by mode. Every TOP-LEVEL scalar/enum field goes through this
    * extraction — whether or not the record also has nested fields — so
    * a field's validation semantics never depend on its siblings.
    * (Inside nested records the leaf strictness is Jackson's, as
    * flatExtractable documents.) */
  private def strictExtract(vg: Column, t: UdType): Column = t match {
    case TOption(x) => strictExtract(vg, x)
    case TInt | TIntN(_, _) =>
      when(schema_of_variant(vg) === "BIGINT",
        try_variant_get(vg, "$", "bigint"))
    case TFloat =>
      val sv = schema_of_variant(vg)
      when(sv === "BIGINT" || sv === "DOUBLE" || sv.startsWith("DECIMAL"),
        try_variant_get(vg, "$", "double"))
    case TFloat32 => // float32-rounded at the ingest boundary
      strictExtract(vg, TFloat).cast("float").cast("double")
    case TBool =>
      when(schema_of_variant(vg) === "BOOLEAN",
        try_variant_get(vg, "$", "boolean"))
    case _ => // TStr and string-literal enums ride as strings
      when(schema_of_variant(vg) === "STRING",
        try_variant_get(vg, "$", "string"))
  }

  /** Parse a JSON-lines Dataset under a declared uDLang record type.
    * Output columns = declared fields (+ `__present` flags for
    * absent-optional ones). Malformed payloads follow `mode`.
    *
    * The payload is parsed exactly TWICE per row — once into a VARIANT
    * (`_pv`: presence / union-tag / missing-vs-null probes) and once
    * under the declared schema (`_rec`: the typed data) — in a
    * projection of their own, with every downstream probe referencing
    * the shared columns. Subexpression elimination alone is not enough:
    * it skips conditionally-evaluated branches (when/coalesce arms), so
    * rooting the probes at a materialized alias is what guarantees one
    * parse per row; CollapseProject keeps the stage split because the
    * parses are non-cheap and multiply-referenced. */
  def read(s: SparkSession, lines: Dataset[String], declared: TRecord,
           mode: ValidatedIngest.Mode): ValidatedIngest.Validated = {
    val schema: StructType = UdScript.schemaOf(declared)
    val raw = lines.toDF("_payload")
    val payload = col("_payload")
    val once = graft.plans.Materialized.once _
    // FLAT schemas (scalars / enums / unions only) need no from_json at
    // all — every field extracts strictly from the one variant parse,
    // halving the per-row Jackson work. Nested shapes keep from_json for
    // their nested fields, but TOP-LEVEL scalars still extract strictly
    // from the variant so field semantics don't depend on siblings.
    val flat = declared.fields.forall(f => flatExtractable(f.t))
    val parsed0 =
      if (flat) raw.select(payload, once(try_parse_json(payload)).as("_pv"))
      else raw.select(payload,
        once(try_parse_json(payload)).as("_pv"),
        once(from_json(payload, schema)).as("_rec"))
    val pv = col("_pv")
    val rec = col("_rec")
    val unionFields = declared.fields.flatMap(f =>
      unionBranches(f.t).map(f.name -> _))
    val unionNames = unionFields.map(_._1).toSet
    def strictField(f: TField): Boolean =
      !unionNames.contains(f.name) && flatExtractable(f.t)
    // Pin every strict scalar extraction (and, per union field, the
    // extracted variant value and inferred tag) ONCE per row — the
    // variant probes would otherwise be re-instantiated in the data
    // column AND each validation check that mentions the field, and
    // subexpression elimination skips conditionally-evaluated arms.
    val pinned = parsed0.columns.map(col).toSeq ++
      unionFields.flatMap { case (n, ts) =>
        val vg = variant_get(pv, s"$$.$n", "variant")
        Seq(once(vg).as(s"_vg_$n"),
          once(unionTag(vg, ts)).as(s"_tag_$n"))
      } ++
      declared.fields.filter(strictField).map(f =>
        once(strictExtract(
          variant_get(pv, s"$$.${f.name}", "variant"), f.t))
          .as(s"_fx_${f.name}"))
    val parsed =
      if (pinned.size == parsed0.columns.size) parsed0
      else parsed0.select(pinned: _*)
    // Declared-type field access: pinned strict variant extraction for
    // top-level scalars/enums, from_json struct access for nested shapes.
    def fieldCol(f: TField): Column =
      if (strictField(f)) col(s"_fx_${f.name}")
      else rec.getField(f.name)
    val unions: Map[String, (Column, Column, Column)] = unionFields.map {
      case (n, ts) =>
        val vg = col(s"_vg_$n")
        val tag = col(s"_tag_$n")
        val presentNonNull = vg.isNotNull &&
          !coalesce(is_variant_null(vg), lit(false))
        n -> (unionStruct(vg, tag, ts), tag, presentNonNull)
    }.toMap
    val dataCols =
      declared.fields.map { f =>
        unions.get(f.name) match {
          case Some((structCol, _, _)) => structCol.as(f.name)
          case None if hasNestedPresence(f.t) =>
            withNestedPresence(pv, rec.getField(f.name), s"$$.${f.name}",
              f.t).as(f.name)
          case None => fieldCol(f).as(f.name)
        }
      } ++
        declared.fields.filter(_.absentOptional).map(f =>
          variant_get(pv, s"$$.${f.name}", "variant").isNotNull
            .as(s"${f.name}__present"))
    // type-safe by default: a PRESENT, non-null value that fails its
    // declared field type (from_json is strict, so the parsed field is
    // null exactly then) is an invalid record, not a silent null — the
    // same posture as the msgpack decoder's coerce errors
    val typeChecks = declared.fields
      .filterNot(f => unions.contains(f.name)).map { f =>
        val vg = variant_get(pv, s"$$.${f.name}", "variant")
        val presentNonNull = vg.isNotNull &&
          !coalesce(is_variant_null(vg), lit(false))
        when(presentNonNull && fieldCol(f).isNull,
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
      val c = fieldCol(f)
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
      val c = fieldCol(f)
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
      (when(pv.isNull, lit("malformed_json:_payload")) +:
        unionFields.map { case (n, _) =>
          val (_, tag, presentNonNull) = unions(n)
          when(presentNonNull && tag.isNull, lit(s"union_no_branch:$n"))
        }) ++ typeChecks ++ enumChecks ++ rangeChecks ++ requiredChecks: _*)
    val tagged = parsed.select(
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
