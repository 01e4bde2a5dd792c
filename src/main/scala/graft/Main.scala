package graft

import java.io.{InputStream, OutputStream, PrintStream}

import graft.lang.Ast._
import graft.lang.{UdParser, UdScript}
import graft.sources.{JsonRecords, Msgpack, ValidatedIngest}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The command-line driver — the reference's front door
  * (/root/reference/src/main.rs:51-62: `--dump-expr`, `--dump-ast path`,
  * `--compile path`, bare `path` = run with records on stdin), re-expressed
  * over the Spark engine.
  *
  * `run` is the unix-filter deployment shape (HACKING.md:136-140): records
  * in on stdin, records out on stdout, JSON-lines or msgpack framing. The
  * stdin/stdout legs are driver-serialized BY DESIGN (a pipe is one
  * stream); `--in`/`--out` paths keep full executor parallelism and are
  * the form a cluster job uses.
  *
  * Usage:
  *   graft.Main --dump-expr                     REPL: parse one expression per line
  *   graft.Main --dump-ast  <script.us>         print the parsed AST
  *   graft.Main --compile   <script.us>         print tier + IO schemas + decls
  *   graft.Main [opts] <script.us>              run records stdin -> stdout
  * Run options:
  *   --format json|msgpack   wire framing (default json)
  *   --in PATH               read records from a file/dir instead of stdin
  *   --out PATH              write records to a dir instead of stdout
  *   --mode abort|skip|dlq   invalid-record handling (default abort;
  *                           dlq routes bad records to stderr)
  *   --libdir DIR            module resolution directory (repeatable)
  *   --cores N               local parallelism (default 4)
  */
object Main {

  final case class CliError(msg: String) extends RuntimeException(msg)

  def main(args: Array[String]): Unit = {
    val code =
      try execute(args.toList, System.in, System.out, System.err, None)
      catch {
        case e: CliError => System.err.println(s"error: ${e.msg}"); 2
        case e: UdScript.CompileError =>
          System.err.println(s"compile error: ${e.getMessage}"); 3
        case e: org.apache.spark.SparkException =>
          // abort-mode validation failures and kernel runtime errors
          // (main.rs `.expect("runtime error")` panics; we exit cleanly)
          System.err.println(s"runtime error: ${e.getMessage}"); 1
      }
    if (code != 0) sys.exit(code)
  }

  /** Testable core: explicit streams, optional externally-owned session.
    * When `session` is None a local session is created (and NOT stopped:
    * the JVM exits right after, and getOrCreate may have returned a
    * shared session we don't own). */
  def execute(args: List[String], in: InputStream, out: PrintStream,
              err: PrintStream, session: Option[SparkSession]): Int =
    args match {
      case "--dump-expr" :: Nil => dumpExpr(in, out); 0
      case "lift" :: rest  => lift(rest, in, out, err); 0
      case "lower" :: rest => lower(rest, in, out); 0
      case "--dump-ast" :: path :: Nil =>
        UdParser.parse(readFile(path)) match {
          case Right(s) => out.println(pretty(s)); 0
          case Left(m)  => err.println(s"parse error: $m"); 3
        }
      case "--compile" :: path :: Nil =>
        val c = compileFile(path, Nil)
        out.println(s"tier: ${c.tier}")
        out.println(s"input schema:  ${c.inputSchema.simpleString}")
        out.println(s"output schema: ${c.outputSchema.simpleString}")
        // the engine's IR is the lowered Spark plan: compile the script
        // against an empty frame of the declared input and dump it
        session.orElse(Some(GraftSession.local(2))).foreach { s =>
          val empty = s.createDataFrame(
            new java.util.ArrayList[Row](), c.inputSchema)
          // analyzed (not optimized): an empty input constant-folds to
          // nothing, and the point is to show the lowering structure
          out.println(c.run(empty).queryExecution.analyzed.toString)
        }
        out.println(pretty(c.script))
        0
      case rest =>
        val (opts, pos) = parseOpts(rest)
        pos match {
          case script :: Nil => run(script, opts, in, out, err, session); 0
          case _ => err.println(usage); 2
        }
    }

  private val usage: String =
    "usage: graft.Main [--dump-expr | --dump-ast F | --compile F | " +
      "lift --json [--oneshot] [--schema F [--reject|--ignore|--warn]] | " +
      "lower --json|--text | " +
      "[--format json|msgpack] [--in PATH] [--out PATH] " +
      "[--mode abort|skip|dlq] [--libdir DIR]... [--cores N] F]"

  final case class Opts(format: String = "json", inPath: Option[String] = None,
                        outPath: Option[String] = None, mode: String = "abort",
                        libDirs: Seq[String] = Nil, cores: Int = 4)

  private def parseOpts(args: List[String]): (Opts, List[String]) = {
    def loop(rest: List[String], o: Opts, pos: List[String]): (Opts, List[String]) =
      rest match {
        case "--format" :: v :: t =>
          if (v != "json" && v != "msgpack") throw CliError(s"bad --format $v")
          loop(t, o.copy(format = v), pos)
        case "--in" :: v :: t     => loop(t, o.copy(inPath = Some(v)), pos)
        case "--out" :: v :: t    => loop(t, o.copy(outPath = Some(v)), pos)
        case "--mode" :: v :: t =>
          // manual.md:48-49 names ignore/warn; ignore = silently skip,
          // warn = dlq (bad records surface on stderr)
          val norm = v match {
            case "ignore" => "skip"
            case "warn"   => "dlq"
            case other    => other
          }
          if (!Set("abort", "skip", "dlq")(norm))
            throw CliError(s"bad --mode $v")
          loop(t, o.copy(mode = norm), pos)
        case "--libdir" :: v :: t => loop(t, o.copy(libDirs = o.libDirs :+ v), pos)
        case "--cores" :: v :: t  => loop(t, o.copy(cores = v.toInt), pos)
        case f :: t if f.startsWith("--") => throw CliError(s"unknown flag $f")
        case f :: t               => loop(t, o, pos :+ f)
        case Nil                  => (o, pos)
      }
    loop(args, Opts(), Nil)
  }

  // ---- lift / lower: the reference's wire-format converters ----
  // (README.md:269-273: `udlift --json --oneshot | udlang todo.md |
  // udlower --text`). Pure stream filters — no Spark session: JSON in,
  // msgpack records out (lift); msgpack in, JSON lines or raw text out
  // (lower). `--oneshot` treats the whole stdin as ONE record.

  private def lift(opts: List[String], in: InputStream, out: PrintStream,
                   err: PrintStream): Unit = {
    if (!opts.contains("--json"))
      throw CliError("lift supports --json [--oneshot] " +
        "[--schema F [--reject|--ignore|--warn]]")
    // --schema F: validate each record against F's declared input record
    // (README.md:298-302): --reject aborts, --ignore drops silently,
    // --warn drops noisily on stderr. Default without --schema: lift
    // whatever arrives (shape deduced from the JSON itself).
    val declared: Option[TRecord] =
      opts.sliding(2).collectFirst { case List("--schema", f) => f }
        .map { f =>
          compileFile(f, Nil).script.input match {
            case r: TRecord => r
            case other => throw CliError(s"--schema input is not a record: $other")
          }
        }
    val mode =
      if (opts.contains("--reject")) "reject"
      else if (opts.contains("--ignore")) "ignore"
      else if (opts.contains("--warn")) "warn"
      else "reject" // type-safe by default (README.md:295-296)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val o = new java.io.BufferedOutputStream(out, 1 << 16)
    def encode(tree: com.fasterxml.jackson.databind.JsonNode): Unit = {
      val bytes = {
        val buf = new java.io.ByteArrayOutputStream()
        Msgpack.writeValue(buf, jsonToValue(tree))
        buf.toByteArray
      }
      declared match {
        case None => o.write(bytes)
        case Some(rec) =>
          // decode-validate through the SAME typed path the engine uses
          val row = Msgpack.decodeOne(bytes, rec)
          val reason = row.getString(row.length - 1)
          if (reason == null) o.write(bytes)
          else mode match {
            case "reject" => throw CliError(s"invalid input: $reason")
            case "ignore" => ()
            case "warn"   => err.println(s"warning: dropped record: $reason")
          }
      }
    }
    if (opts.contains("--oneshot")) encode(mapper.readTree(in))
    else {
      val sc = new java.util.Scanner(in, "UTF-8")
      while (sc.hasNextLine) {
        val line = sc.nextLine()
        if (line.trim.nonEmpty) encode(mapper.readTree(line))
      }
    }
    o.flush()
  }

  private def jsonToValue(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull) null
    else if (n.isBoolean) n.booleanValue()
    else if (n.isIntegralNumber) n.longValue()
    else if (n.isNumber) n.doubleValue()
    else if (n.isTextual) n.textValue()
    else if (n.isArray) n.elements().asScala.map(jsonToValue).toVector
    else // object: ordered entries -> msgpack map
      scala.collection.immutable.VectorMap.from(
        n.fields().asScala.map(e => e.getKey -> jsonToValue(e.getValue)))
  }

  private def lower(opts: List[String], in: InputStream,
                    out: PrintStream): Unit = {
    val asText = opts.contains("--text")
    if (!asText && !opts.contains("--json"))
      throw CliError("lower supports --json | --text")
    val buf = java.nio.ByteBuffer.wrap(in.readAllBytes())
    while (buf.hasRemaining) {
      val v = Msgpack.readValue(buf)
      if (asText) v match {
        case s: String => out.println(s)
        case other     => out.println(renderJson(other))
      }
      else out.println(renderJson(v))
    }
  }

  /** Minimal JSON rendering of decoded msgpack values (maps decode to
    * ordered entry vectors). */
  def renderJson(v: Any): String = v match {
    case null       => "null"
    case b: Boolean => b.toString
    case i: Long    => i.toString
    case d: Double  => if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
    case s: String  => quote(s)
    case bytes: Array[Byte] =>
      quote(java.util.Base64.getEncoder.encodeToString(bytes))
    case xs: Vector[_] if xs.forall(_.isInstanceOf[(_, _)]) && xs.nonEmpty =>
      xs.collect { case (k: String, x) => quote(k) + ":" + renderJson(x) }
        .mkString("{", ",", "}")
    case xs: Vector[_] if xs.isEmpty => "[]"
    case xs: Vector[_] => xs.map(renderJson).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => quote(String.valueOf(k)) + ":" + renderJson(x) }
        .mkString("{", ",", "}")
    case other => quote(String.valueOf(other))
  }

  private def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u$c%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  // ---- subcommands ----

  private def dumpExpr(in: InputStream, out: PrintStream): Unit = {
    val sc = new java.util.Scanner(in, "UTF-8")
    while (sc.hasNextLine) {
      val line = sc.nextLine()
      if (line.trim.nonEmpty)
        out.println(UdParser.parseExprStr(line)
          .fold(m => s"error: $m", e => pretty(e)))
    }
  }

  private def run(path: String, opts: Opts, in: InputStream,
                  out: PrintStream, errS: PrintStream,
                  session: Option[SparkSession]): Unit = {
    val c = compileFile(path, opts.libDirs)
    val s = session.getOrElse(GraftSession.local(opts.cores))
    val mode = opts.mode match {
      case "abort" => ValidatedIngest.Abort
      case "skip"  => ValidatedIngest.Skip
      case "dlq"   => ValidatedIngest.Dlq
    }
    val validated = readInput(s, c, opts, in, mode)
    if (opts.mode == "dlq")
      validated.bad.toLocalIterator().forEachRemaining { r =>
        errS.println(r.mkString("\t"))
      }
    // --mode dlq also routes RUNTIME throws (the udmonad dead-letter
    // posture): a record whose kernel evaluation throws lands on stderr
    // with its input row + message, clean records keep flowing. In
    // abort/skip modes a throw keeps its fail-the-run semantics.
    val result =
      if (opts.mode == "dlq") {
        val (good, dead) = c.runEither(validated.good)
        dead.toLocalIterator().forEachRemaining { r =>
          errS.println(r.mkString("\t"))
        }
        good
      } else c.run(validated.good)
    // scalar-output scripts emit BARE wire values on the pipe (the
    // reference's model: `udlower --text` receives msgpack strings);
    // record outputs emit record maps / JSON objects. File legs always
    // keep the columnar record shape.
    val scalarOut = !c.script.output.isInstanceOf[TRecord] &&
      !c.script.output.isInstanceOf[TTuple]
    opts.outPath match {
      case Some(p) if opts.format == "msgpack" => Msgpack.write(result, p)
      case Some(p) => // same replace semantics as the msgpack sink
        JsonRecords.toJsonLines(result).write.mode("overwrite").text(p)
      case None if opts.format == "msgpack" =>
        val buffered = new java.io.BufferedOutputStream(out, 1 << 16)
        if (scalarOut)
          localRows(result).foreach(r => Msgpack.writeValue(buffered, r.get(0)))
        else
          Msgpack.writeRows(buffered, result.schema.fieldNames.toSeq,
            localRows(result))
        buffered.flush()
      case None if scalarOut =>
        localRows(result).foreach(r => out.println(renderJson(r.get(0))))
      case None =>
        JsonRecords.toJsonLines(result).toLocalIterator()
          .forEachRemaining(out.println)
    }
  }

  /** toLocalIterator as a plain scala Iterator[Row]. */
  private def localRows(df: DataFrame): Iterator[Row] = {
    val it = df.toLocalIterator()
    new Iterator[Row] {
      def hasNext: Boolean = it.hasNext
      def next(): Row = it.next()
    }
  }

  /** Input leg: declared-type-driven decode from stdin or a path, in
    * either framing. Record inputs go through the validating sources
    * (presence flags, modes); scalar inputs are JSON values one-per-line. */
  private def readInput(s: SparkSession, c: UdScript.Compiled, opts: Opts,
                        in: InputStream, mode: ValidatedIngest.Mode)
      : ValidatedIngest.Validated = {
    import s.implicits._
    c.script.input match {
      case rec: TRecord => (opts.format, opts.inPath) match {
        case ("msgpack", Some(p)) => Msgpack.read(s, p, rec, mode)
        case ("msgpack", None) =>
          val bytes = in.readAllBytes()
          val rows = Msgpack.decodeFile(bytes, rec).toSeq
          val tagged = s.createDataFrame(
            new java.util.ArrayList[Row](scala.jdk.CollectionConverters
              .SeqHasAsJava(rows).asJava),
            Msgpack.decodedSchema(rec))
          ValidatedIngest.routeTagged(tagged, mode)
        case ("json", Some(p)) =>
          JsonRecords.read(s, s.read.textFile(p), rec, mode)
        case ("json", None) =>
          val lines = scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toSeq
          JsonRecords.read(s, s.createDataset(lines), rec, mode)
        case (other, _) => throw CliError(s"unsupported format: $other")
      }
      case scalar =>
        if (opts.format != "json")
          throw CliError("scalar input requires --format json (one JSON value per line)")
        val lines: Seq[String] = opts.inPath match {
          case Some(p) => s.read.textFile(p).collect().toSeq
          case None => scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toSeq
        }
        val schema = StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            c.inputSchema.fields(0).dataType)))
        val df = s.createDataset(lines).toDF("_payload")
          .select(from_json(concat(lit("{\"value\":"), col("_payload"),
            lit("}")), schema).getField("value").as("value"))
        ValidatedIngest.Validated(df, s.emptyDataFrame)
    }
  }

  // ---- helpers ----

  private def readFile(path: String): String = {
    val f = new java.io.File(path)
    if (!f.exists()) throw CliError(s"no such file: $path")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  private def compileFile(path: String, libDirs: Seq[String]): UdScript.Compiled = {
    // modules resolve relative to the script's own directory first,
    // matching the reference's file-relative import story
    val parentDir = Option(new java.io.File(path).getAbsoluteFile.getParent)
    UdScript.compile(readFile(path),
      libraryDirs = libDirs ++ parentDir.toSeq)
  }

  /** Indented one-node-per-line AST rendering (case-class product walk) —
    * the moral equivalent of the reference's {:#?} debug formatting. */
  def pretty(x: Any, indent: Int = 0): String = {
    val pad = "  " * indent
    x match {
      case s: String => pad + "\"" + s + "\""
      case xs: Seq[_] if xs.isEmpty => pad + "[]"
      case xs: Seq[_] =>
        pad + "[\n" + xs.map(pretty(_, indent + 1)).mkString(",\n") + s"\n$pad]"
      case p: Product if p.productArity == 0 => pad + p.productPrefix
      case p: Product =>
        val kids = p.productIterator.map(pretty(_, indent + 1)).mkString(",\n")
        pad + p.productPrefix + "(\n" + kids + s"\n$pad)"
      case other => pad + String.valueOf(other)
    }
  }
}
