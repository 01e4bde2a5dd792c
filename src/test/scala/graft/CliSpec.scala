package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.ByteBuffer

import graft.sources.Msgpack

/** End-to-end CLI driver (reference main.rs:51-62 UX): scripts from the
  * examples/ corpus, records in on stdin, records out on stdout. */
class CliSpec extends SparkSpec {

  private def cli(args: List[String], stdin: Array[Byte] = Array.empty)
      : (Int, String, String) = {
    val out = new ByteArrayOutputStream()
    val err = new ByteArrayOutputStream()
    val code = Main.execute(args, new ByteArrayInputStream(stdin),
      new PrintStream(out, true, "UTF-8"), new PrintStream(err, true, "UTF-8"),
      Some(spark))
    (code, out.toString("UTF-8"), err.toString("UTF-8"))
  }

  test("run examples/hello.us: scalar JSON values stdin -> stdout") {
    val (code, out, _) = cli(List("examples/hello.us"),
      "\"world\"\n\"graft\"\n".getBytes("UTF-8"))
    assert(code == 0)
    // scalar outputs emit BARE values on the pipe (reference model)
    assert(out.linesIterator.toSeq.sorted ==
      Seq("\"Hello, graft\"", "\"Hello, world\""))
  }

  test("run examples/filter_events.us: JSON records, filter + match") {
    val stdin =
      """{"event_id": 1, "event_type": "click", "value": 80.5}
        |{"event_id": 2, "event_type": "view", "value": 10.0}
        |{"event_id": 3, "event_type": "purchase", "value": 60.0}
        |""".stripMargin.getBytes("UTF-8")
    val (code, out, _) = cli(List("examples/filter_events.us"), stdin)
    assert(code == 0)
    val lines = out.linesIterator.toSeq.sorted
    assert(lines == Seq(
      """{"event_id":1,"cat":"ui","boosted":161.0}""",
      """{"event_id":3,"cat":"commerce","boosted":120.0}""").sorted)
  }

  test("run with msgpack framing round-trips records through stdin/stdout") {
    val o = new ByteArrayOutputStream()
    Msgpack.writeMap(o, Seq("event_id" -> 7L, "event_type" -> "click",
      "value" -> 99.0))
    Msgpack.writeMap(o, Seq("event_id" -> 8L, "event_type" -> "view",
      "value" -> 1.0))
    val (code, _, _) = cli(
      List("--format", "msgpack", "examples/filter_events.us"), o.toByteArray)
    assert(code == 0)
    // re-run capturing raw bytes: decode stdout as msgpack records
    val out = new ByteArrayOutputStream()
    val ps = new PrintStream(out, true, "UTF-8")
    assert(Main.execute(List("--format", "msgpack", "examples/filter_events.us"),
      new ByteArrayInputStream(o.toByteArray), ps,
      new PrintStream(new ByteArrayOutputStream()), Some(spark)) == 0)
    val decoded = Msgpack.readValue(ByteBuffer.wrap(out.toByteArray))
    assert(decoded == Vector("event_id" -> 7L, "cat" -> "ui",
      "boosted" -> 198.0))
  }

  test("--mode dlq routes invalid records to stderr, good ones to stdout") {
    val stdin =
      """{"event_id": 1, "event_type": "click", "value": 80.5}
        |this is not json
        |""".stripMargin.getBytes("UTF-8")
    val (code, out, err) = cli(
      List("--mode", "dlq", "examples/filter_events.us"), stdin)
    assert(code == 0)
    assert(out.linesIterator.size == 1)
    assert(err.contains("this is not json"))
  }

  test("run examples/checked_effects.us: effect-annotated script + DLQ") {
    val stdin =
      """{"event_id": 1, "value": 4.5}
        |{"event_id": 2, "value": -1.0}
        |{"event_id": 3, "value": 2.0}
        |""".stripMargin.getBytes("UTF-8")
    val (code, out, err) = cli(
      List("--mode", "dlq", "examples/checked_effects.us"), stdin)
    assert(code == 0)
    val lines = out.linesIterator.toSeq.sorted
    assert(lines == Seq(
      """{"event_id":1,"score":45.0}""",
      """{"event_id":3,"score":20.0}""").sorted, s"stdout: $lines")
    assert(err.contains("negative value"), s"stderr: $err")
  }

  test("--dump-ast and --compile print the front-end view") {
    val (c1, ast, _) = cli(List("--dump-ast", "examples/hello.us"))
    assert(c1 == 0)
    assert(ast.contains("Script") && ast.contains("Hello world, in uDLang"))
    val (c2, comp, _) = cli(List("--compile", "examples/filter_events.us"))
    assert(c2 == 0)
    assert(comp.contains("tier: ColumnTier"))
    assert(comp.contains("input schema:"))
  }

  test("--dump-expr parses one expression per line") {
    val (code, out, _) = cli(List("--dump-expr"),
      "1 + 2\nnot an ) expr\n".getBytes("UTF-8"))
    assert(code == 0)
    val lines = out.linesIterator.toSeq
    assert(lines.head.contains("BinOp") || lines.mkString.contains("Add"))
    assert(out.contains("error:"))
  }

  test("lift and lower convert between JSON and msgpack framings") {
    // lift: JSON lines -> msgpack records
    val json = """{"id": 1, "name": "a", "score": 1.5}
                 |{"id": 2, "name": "b", "score": null}
                 |""".stripMargin
    val liftOut = new ByteArrayOutputStream()
    assert(Main.execute(List("lift", "--json"),
      new ByteArrayInputStream(json.getBytes("UTF-8")),
      new PrintStream(liftOut, true, "UTF-8"),
      new PrintStream(new ByteArrayOutputStream()), Some(spark)) == 0)
    val decoded = {
      val b = ByteBuffer.wrap(liftOut.toByteArray)
      Iterator.continually(if (b.hasRemaining) Some(Msgpack.readValue(b))
        else None).takeWhile(_.isDefined).flatten.toSeq
    }
    assert(decoded == Seq(
      Vector("id" -> 1L, "name" -> "a", "score" -> 1.5),
      Vector("id" -> 2L, "name" -> "b", "score" -> null)))
    // lower: msgpack records -> JSON lines (round trip)
    val (code, lowered, _) = cli(List("lower", "--json"), liftOut.toByteArray)
    assert(code == 0)
    assert(lowered.linesIterator.toSeq == Seq(
      """{"id":1,"name":"a","score":1.5}""",
      """{"id":2,"name":"b","score":null}"""))
    // lower --text: one raw line per msgpack string
    val o = new ByteArrayOutputStream()
    Msgpack.writeValue(o, "hello")
    Msgpack.writeValue(o, "world")
    val (c2, text, _) = cli(List("lower", "--text"), o.toByteArray)
    assert(c2 == 0 && text.linesIterator.toSeq == Seq("hello", "world"))
    // --oneshot: whole stdin is ONE record
    val one = new ByteArrayOutputStream()
    assert(Main.execute(List("lift", "--json", "--oneshot"),
      new ByteArrayInputStream("""{"items": [1, 2, 3]}""".getBytes("UTF-8")),
      new PrintStream(one, true, "UTF-8"),
      new PrintStream(new ByteArrayOutputStream()), Some(spark)) == 0)
    assert(Msgpack.readValue(ByteBuffer.wrap(one.toByteArray)) ==
      Vector("items" -> Vector(1L, 2L, 3L)))
  }

  test("modules resolve from --libdir (and the script's own directory)") {
    val stdin = """{"doc_id": 1, "text": "cli"}""".getBytes("UTF-8")
    // explicit --libdir
    val (c1, out1, _) = cli(List("--libdir", "examples/lib",
      "examples/use_greet.us"), stdin)
    assert(c1 == 0)
    assert(out1.trim == """{"doc_id":1,"msg":"Hello, cli! :: "}""")
    // script-directory resolution alone does NOT find examples/lib —
    // the module must be looked up where the user said it lives
    val thrown = intercept[Exception] {
      cli(List("examples/use_greet.us"), stdin)
    }
    assert(thrown.getMessage.contains("greet"))
  }

  test("the README pipe shape: lift --oneshot | render script | lower --text") {
    val json = """{"doc_id": 7, "text": "a <b> & c"}""".getBytes("UTF-8")
    val lifted = new ByteArrayOutputStream()
    assert(Main.execute(List("lift", "--json", "--oneshot"),
      new ByteArrayInputStream(json), new PrintStream(lifted, true, "UTF-8"),
      new PrintStream(new ByteArrayOutputStream()), Some(spark)) == 0)
    val ran = new ByteArrayOutputStream()
    assert(Main.execute(List("--format", "msgpack", "--libdir", "examples/lib",
      "examples/render_doc.us"),
      new ByteArrayInputStream(lifted.toByteArray),
      new PrintStream(ran, true, "UTF-8"),
      new PrintStream(new ByteArrayOutputStream()), Some(spark)) == 0)
    val (code, text, _) = cli(List("lower", "--text"), ran.toByteArray)
    assert(code == 0)
    assert(text.trim == """<div id="doc-7">a &lt;b&gt; &amp; c</div>""")
  }

  test("lift --schema validates against a script's declared input") {
    val stdin =
      """{"event_id": 1, "event_type": "click", "value": 80.5}
        |{"event_id": "oops", "event_type": "view", "value": 1.0}
        |""".stripMargin.getBytes("UTF-8")
    def liftRaw(extra: List[String]): (Int, Array[Byte], String) = {
      val out = new ByteArrayOutputStream()
      val err = new ByteArrayOutputStream()
      val code =
        try Main.execute(List("lift", "--json", "--schema",
          "examples/filter_events.us") ++ extra,
          new ByteArrayInputStream(stdin),
          new PrintStream(out, true, "UTF-8"),
          new PrintStream(err, true, "UTF-8"), Some(spark))
        catch { case e: Main.CliError => 2 }
      (code, out.toByteArray, err.toString("UTF-8"))
    }
    // --warn: bad record dropped noisily, the good one lifts
    val (c1, out1, err1) = liftRaw(List("--warn"))
    assert(c1 == 0)
    assert(err1.contains("warning") && err1.contains("event_id"))
    val b = ByteBuffer.wrap(out1)
    assert(Msgpack.readValue(b) == Vector("event_id" -> 1L,
      "event_type" -> "click", "value" -> 80.5))
    assert(!b.hasRemaining) // exactly one record survived
    // --reject (the default): abort on the invalid record
    val (c2, _, _) = liftRaw(Nil)
    assert(c2 != 0)
    // --ignore: silent drop
    val (c3, _, err3) = liftRaw(List("--ignore"))
    assert(c3 == 0 && err3.isEmpty)
  }

  test("--in/--out paths keep the parallel file legs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli").toFile
    val inFile = new java.io.File(dir, "events.jsonl")
    val w = new java.io.PrintWriter(inFile, "UTF-8")
    try {
      w.println("""{"event_id": 1, "event_type": "click", "value": 80.5}""")
      w.println("""{"event_id": 2, "event_type": "view", "value": 10.0}""")
    } finally w.close()
    val outDir = new java.io.File(dir, "out")
    val (code, _, _) = cli(List("--in", inFile.getPath,
      "--out", outDir.getPath, "examples/filter_events.us"))
    assert(code == 0)
    val produced = spark.read.text(outDir.getPath).collect().map(_.getString(0))
    assert(produced.toSeq == Seq("""{"event_id":1,"cat":"ui","boosted":161.0}"""))
  }
}
