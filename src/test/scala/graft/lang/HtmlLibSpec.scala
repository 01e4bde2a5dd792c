package graft.lang

import java.nio.file.Files

import graft.SparkSpec

/** The README html library (reference README.md:304-384) end-to-end: the
  * library source lives as FILES on disk, resolves through libraryDirs
  * (transitively — html.ud imports textutil.ud), and exercises rest
  * params, `$...` partial application, alias/glob/nested import selectors
  * and record method/static/const members.
  *
  * Adaptations from the README sketch (which is pre-MVP pseudo-code and
  * references undefined names like `content`): attrs iterate via keys();
  * type-pattern match uses our `case x: T` syntax; escape/quote are
  * implemented (the README omits them "for brevity").
  */
class HtmlLibSpec extends SparkSpec {
  import spark.implicits._

  private val textutilUd =
    """version 0.1;
      |lib "text escaping";
      |export func escape(text: Str) -> Str {
      |  replace(replace(replace(text, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
      |}
      |export func quote(text: Str) -> Str { "\"" + escape(text) + "\"" }
      |""".stripMargin

  private val htmlUd =
    """version 0.1;
      |lib "Simple Html Formatting Library";
      |
      |import textutil.*;
      |
      |export type Output: Str;
      |
      |export type Element: {
      |  tag: String,
      |  attrs: {[String]: String},
      |  children: [Any],
      |  requiresClose: Bool
      |};
      |
      |export func element(
      |  tag: Str,
      |  attrs: Map<Str>,
      |  allowChildren: Bool,
      |  ...children: Any,
      |) -> Element {
      |  if (allowChildren) {
      |    {tag: tag, attrs: attrs, children: children, requiresClose: true}
      |  } elif (children.length > 0) {
      |    throw tag + " tags should not contain children!";
      |  } else {
      |    {tag: tag, attrs: attrs, children: children, requiresClose: false}
      |  }
      |}
      |
      |// NOTE the README sketch maps with bare `$` (escape($) + ...), but $
      |// in call-argument position is partial application, so the body uses
      |// explicit lambdas — same semantics, unambiguous.
      |export func format(e: Element) -> String {
      |  let attrStr = [keys(e.attrs) |
      |    (k: Str) -> Str { " " + escape(k) + "=" + quote(e.attrs[k]) }];
      |  let openTag = "<" + e.tag + attrStr.join("") + ">";
      |  if (e.requiresClose) {
      |    let content = [e.children | (c: Any) -> Str {
      |      match (c) {
      |        case s: Str => escape(s);
      |        else => format(c);
      |      }
      |    }];
      |    openTag + content.join("") + "</" + e.tag + ">"
      |  } else {
      |    openTag
      |  }
      |}
      |
      |export html = element("html", $, true, $...);
      |export body = element("body", $, true, $...);
      |export div  = element("div",  $, true, $...);
      |export br   = element("br", $, false);
      |""".stripMargin

  private lazy val libDir: String = {
    val d = Files.createTempDirectory("udlibs")
    Files.write(d.resolve("textutil.ud"), textutilUd.getBytes("UTF-8"))
    Files.write(d.resolve("html.ud"), htmlUd.getBytes("UTF-8"))
    d.toString
  }

  test("html library renders the documented markup from files") {
    val src = """script "render a page";
      |import html.{format, div as d, br};
      |input  {title: Str, note: Str};
      |output Str;
      |out format(d({id: "main", class: "a<b"}, in.title, br({}), in.note));
      |""".stripMargin
    val c = UdScript.compile(src, libraryDirs = Seq(libDir))
    val out = c.run(Seq(("Tom & Jerry", "x<y")).toDF("title", "note"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq(
      """<div id="main" class="a&lt;b">Tom &amp; Jerry<br>x&lt;y</div>"""))
  }

  test("void elements refuse children (throw in the library)") {
    val src = """script "bad br";
      |import html.*;
      |input  Str;
      |output Str;
      |out format(br({}, in));
      |""".stripMargin
    val c = UdScript.compile(src, libraryDirs = Seq(libDir))
    val ex = intercept[org.apache.spark.SparkException] {
      c.run(Seq("x").toDF("value")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("glob import splices all exports; module-itself selector keeps the namespace") {
    val globSrc = """script "glob";
      |import html.*;
      |input  Str;
      |output Str;
      |out format(div({}, in));
      |""".stripMargin
    val g = UdScript.compile(globSrc, libraryDirs = Seq(libDir))
    assert(g.run(Seq("hi").toDF("value")).collect().map(_.getString(0))
      .toSeq == Seq("<div>hi</div>"))
    val itselfSrc = """script "itself";
      |import html._;
      |input  Str;
      |output Str;
      |out html.format(html.div({}, in));
      |""".stripMargin
    val i = UdScript.compile(itselfSrc, libraryDirs = Seq(libDir))
    assert(i.run(Seq("yo").toDF("value")).collect().map(_.getString(0))
      .toSeq == Seq("<div>yo</div>"))
  }

  test("nested import selector reaches into a sub-module") {
    val utilUd =
      """lib "nested modules";
        |export strings = {
        |  shout: (s: Str) -> Str { s + "!" },
        |  greet: (s: Str) -> Str { "Hello, " + s }
        |};
        |""".stripMargin
    val d = Files.createTempDirectory("udlibs2")
    Files.write(d.resolve("util.ud"), utilUd.getBytes("UTF-8"))
    val src = """script "nested";
      |import util.strings.{shout, greet as hi};
      |input  Str;
      |output Str;
      |out shout(hi(in));
      |""".stripMargin
    val c = UdScript.compile(src, libraryDirs = Seq(d.toString))
    assert(c.run(Seq("world").toDF("value")).collect().map(_.getString(0))
      .toSeq == Seq("Hello, world!"))
  }

  test("record method/static/const members (vtable surface)") {
    val src = """script "members";
      |type Point: {
      |  x: Float,
      |  y: Float;
      |  const dims: Int = 2;
      |  static origin() -> Point { {x: 0.0, y: 0.0} };
      |  method mag2() -> Float { self.x * self.x + self.y * self.y }
      |};
      |input  Float;
      |output Float;
      |let p = {x: 3.0, y: 4.0};
      |out p.mag2() + (Point.dims as Float) + Point.origin().x + in;
      |""".stripMargin
    val c = UdScript.compile(src)
    assert(c.tier == UdScript.KernelTier)
    val out = c.run(Seq(0.5).toDF("value")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(25.0 + 2.0 + 0.0 + 0.5))
  }

  test("cyclic imports fail with the chain named") {
    val d = Files.createTempDirectory("udlibs3")
    Files.write(d.resolve("a.ud"), "import b;\nexport one = 1;".getBytes)
    Files.write(d.resolve("b.ud"), "import a;\nexport two = 2;".getBytes)
    val src = """script "cyc";
      |import a;
      |input Str; output Str;
      |out in;""".stripMargin
    val ex = intercept[UdScript.CompileError] {
      UdScript.compile(src, libraryDirs = Seq(d.toString))
    }
    assert(ex.msg.contains("cyclic import"))
  }
}
