package graft.lang

import graft.SparkSpec

/** F7 spread, F9 method sugar, F11 modules, D12 template calls, P5
  * Option destructuring. */
class ModulesSpec extends SparkSpec {
  import spark.implicits._

  test("import resolves library decls; module members callable (F11)") {
    val htmlLib = """
      |export func tag(name: Str, body: Str) -> Str {
      |  "<" + name + ">" + body + "</" + name + ">"
      |}
      |export let nbsp = "&nbsp;";""".stripMargin
    val src = """script "uses html lib";
      |import html;
      |input  Str;
      |output Str;
      |out html.tag("b", in + html.nbsp);""".stripMargin
    val c = UdScript.compile(src, libraries = Map("html" -> htmlLib))
    val out = c.run(Seq("hi").toDF("value")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("<b>hi&nbsp;</b>"))
  }

  test("call-site spread splices a list into arguments (F7)") {
    val src = """script "spread";
      |input  Int;
      |output Int;
      |func add3(a: Int, b: Int, c: Int) -> Int { a + b + c }
      |let args = [10, 100];
      |out add3(in, ...args);""".stripMargin
    val c = UdScript.compile(src)
    assert(c.run(Seq(1L).toDF("value")).collect()(0).getLong(0) == 111L)
  }

  test("method-call sugar: x.f(a) dispatches to f(x, a) (F9)") {
    val src = """script "sugar";
      |input  Int;
      |output Int;
      |func scaled(x: Int, factor: Int) -> Int { x * factor }
      |out in.scaled(3);""".stripMargin
    val c = UdScript.compile(src)
    assert(c.run(Seq(7L).toDF("value")).collect()(0).getLong(0) == 21L)
  }

  test("template call with trailing block (D12)") {
    val src = """script "template";
      |input  Int;
      |output Str;
      |proc twice(body: (() -> None)) {
      |  body();
      |  body();
      |}
      |twice() {
      |  out "tick";
      |}""".stripMargin
    val c = UdScript.compile(src, strict = false)
    val out = c.run(Seq(0L).toDF("value")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("tick", "tick"))
  }

  test("match destructures Some(x) / none over optional values (P5)") {
    val src = """script "opt";
      |input  {id: Int, blocker?: Int};
      |output {id: Int, msg: Str};
      |out {id: in.id,
      |     msg: match (in.blocker) {
      |       case Some(b) => "blocked on " + b as Str;
      |       case none => "clear";
      |     }};""".stripMargin
    val c = UdScript.compile(src)
    val df = Seq((1L, Some(42L)), (2L, None))
      .toDF("id", "blocker")
    val rows = c.run(df).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet == Set((1L, "blocked on 42"), (2L, "clear")))
  }
}
