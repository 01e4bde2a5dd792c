package graft.text

import graft.SparkSpec
import graft.text.HtmlExtract._

/** HTML extraction semantics beyond the oracle's reach: the parser over
  * HOSTILE non-fixture markup (the oracle only replays authored
  * fixtures), classification edge rules, and mutation/truncation fuzz —
  * a crawl-scale extractor's inputs are adversarial by definition. */
class HtmlExtractSpec extends SparkSpec {

  private def words(html: String): Vector[Vector[String]] =
    parse(html).map(_.words)

  test("block segmentation: block-level tags flush, inline tags only " +
    "break words, whitespace runs normalize away") {
    val bs = parse(
      "<div>alpha  beta</div><p>gamma <b>delta</b>-epsilon</p>zeta")
    assert(bs.map(_.words) == Vector(
      Vector("alpha", "beta"),
      Vector("gamma", "delta", "-epsilon"),
      Vector("zeta")))
    assert(bs.map(_.tag) == Vector("div", "p", "body"))
  }

  test("script and style are raw text: fake close tags inside strings, " +
    "unquoted '<', and comment-wrapped markup never become blocks") {
    val bs = parse(
      """<style>p { x: 1 } /* <p>no</p> */</style>
        |<script>var s = "</div> <p>"; if (1 < 2) { s = "x"; }</script>
        |<p>real</p>""".stripMargin)
    assert(bs.map(_.words) == Vector(Vector("real")))
    // close-tag scan is case-insensitive in BOTH directions
    assert(words("<SCRIPT>var x = 1;</script><p>a</p>" +
      "<script>y</SCRIPT><p>b</p>") == Vector(Vector("a"), Vector("b")))
  }

  test("attributes: '>' inside quoted values does not close the tag; " +
    "unquoted attributes still terminate at '>'") {
    assert(words("""<p title="a > b">kept</p>""") ==
      Vector(Vector("kept")))
    assert(words("""<p class=c title='x > y'>kept</p>""") ==
      Vector(Vector("kept")))
  }

  test("entities: named, decimal, hex decode; unknown and unterminated " +
    "stay literal; &nbsp; is a word boundary") {
    assert(words("<p>Q&amp;A &quot;q&quot; &#65; &#x42; " +
      "&bogus; &amp x&nbsp;y</p>") ==
      Vector(Vector("Q&A", "\"q\"", "A", "B", "&bogus;", "&amp", "x", "y")))
  }

  test("link words: <a> depth tracks across nesting and floors at zero " +
    "on unbalanced closes") {
    val bs = parse("<p>plain <a href='/x'>linked words</a> tail</p>" +
      "<p></a>after stray close</p>")
    assert(bs(0).linkWords == 2)
    assert(bs(1).linkWords == 0)
  }

  test("comments and doctype skip; unclosed comment swallows the tail " +
    "without throwing") {
    assert(words("<!DOCTYPE html><!-- <p>x</p> --><p>y</p>") ==
      Vector(Vector("y")))
    assert(words("<p>a</p><!-- never closed <p>b</p>") ==
      Vector(Vector("a")))
  }

  test("stray '<' degrades to text; truncated tag at EOF does not throw") {
    assert(words("<p>1 < 2 and 3<4</p>") ==
      Vector(Vector("1", "<", "2", "and", "3<4")))
    assert(words("<p>ok</p><di").head == Vector("ok"))
  }

  test("classification: exact integer thresholds at the boundaries") {
    def blk(w: Int, link: Int, stop: Int) =
      Block("p", Vector.fill(w)("w"), link, stop)
    // link density exactly 1/3 is NOT bad (rule is strict >)
    assert(contextFreeClass(blk(9, 3, 1)) == "good")
    assert(contextFreeClass(blk(9, 4, 1)) == "bad")
    // words boundary: 7 short, 8 decided
    assert(contextFreeClass(blk(7, 0, 7)) == "short")
    assert(contextFreeClass(blk(8, 0, 1)) == "good")  // 25*1 >= 8
    assert(contextFreeClass(blk(26, 0, 1)) == "bad")  // 25*1 < 26
    assert(contextFreeClass(blk(25, 0, 1)) == "good") // 25*1 >= 25
  }

  test("context pass: short blocks inherit from nearest decided " +
    "neighbor in either direction; all-short documents drop") {
    def short0 = Block("p", Vector("x", "y"), 0, 0)
    def good0 = Block("p", Vector.fill(8)("the"), 0, 8)
    def bad0 = Block("p", Vector.fill(3)("w"), 3, 0)
    val c1 = classify(Vector(short0, good0, bad0, short0))
    assert(c1.map(_.keep) == Vector(true, true, false, false))
    val c2 = classify(Vector(bad0, short0, good0))
    assert(c2.map(_.keep) == Vector(false, true, true))
    assert(classify(Vector(short0, short0)).forall(!_.keep))
  }

  test("fixture round-trip: the parser inverts the assembler exactly " +
    "(paragraph tokens, boilerplate stats, extraction)") {
    val text = "the fast key order sort table scan merge part window " +
      "small hash scan join order batch batch batch stream spark"
    val id = 7L
    val cs = classify(parse(fixtureHtml(id, text)))
    val toks = text.split("\\s+").toVector
    val nb = 2 + (id % 3).toInt // 3 paragraphs
    val nli = 2 + (id % 2).toInt // 3 nav items
    // structure: title, 3 li, h1, 3 p, qa, footer = 10 blocks
    assert(cs.length == 1 + nli + 1 + nb + 2)
    assert(cs.map(_.block.tag) == Vector("title", "li", "li", "li", "h1",
      "p", "p", "p", "p", "div"))
    val p0 = cs(nli + 2).block
    assert(p0.words == toks.slice(0, toks.length / nb) ++
      Vector("see", "the", "reference", "for", "more"))
    assert(p0.linkWords == 2)
    // nav items are pure-link bad blocks; footer is half-link bad
    assert(cs.slice(1, 1 + nli).forall(_.cls == "bad"))
    assert(cs.last.cls == "bad")
    // qa block is always good -> extraction never empty
    assert(cs(nli + 2 + nb).cls == "good")
    assert(extractText(cs).nonEmpty)
  }

  test("link harvesting: hrefs in document order, entity-decoded " +
    "values, quoted '>' and '=', unquoted and bare attributes, " +
    "href-less anchors skipped, unclosed links finalize") {
    val (_, links) = parseWithLinks(
      """<p><a href="/a?x=1&amp;y=2">one two</a>
        |<a class=c href='/b'>three</a>
        |<a name="x">no href</a>
        |<a href="/c" title="a > b = c">four</a>
        |<a href=/d>tail words""".stripMargin)
    assert(links == Vector(
      Link("/a?x=1&y=2", 2), Link("/b", 1),
      Link("/c", 1), Link("/d", 2)))
    // nested links: words attribute to the innermost open link
    val (_, nested) = parseWithLinks(
      "<p><a href='/outer'>x <a href='/inner'>y</a></a></p>")
    assert(nested == Vector(Link("/outer", 1), Link("/inner", 1)))
    // truncated attribute at EOF must not throw
    assert(parseWithLinks("<p><a href=\"/unterminated")._2
      .forall(_.href.startsWith("/")))
  }

  test("fixture links: nav + cross-doc + footer in document order with " +
    "the deterministic /doc/ edge") {
    val (_, links) = parseWithLinks(fixtureHtml(7L, "the quick brown fox"))
    // id 7: nli = 3 nav links, then /doc/(7*7+1)%1000 = /doc/50, the
    // footer pair, and the anchor-less normalization-fixture link
    assert(links.map(_.href) == Vector("/home?x=1&y=2", "/about",
      "/contact", "/doc/50", "/terms", "/privacy",
      "../legal/./terms#top"))
    assert(links.map(_.anchorWords) == Vector(1, 2, 1, 2, 1, 1, 0))
  }

  test("mutation fuzz: 300 byte flips + truncations of a fixture page " +
    "parse without throwing and classification stays total") {
    val base = fixtureHtml(11L,
      "the quick brown fox jumps over the lazy dog again and again")
    val rnd = new scala.util.Random(42)
    for (k <- 0 until 300) {
      val arr = base.toCharArray
      val i = rnd.nextInt(arr.length)
      arr(i) = (rnd.nextInt(94) + 33).toChar
      val mutated = new String(arr)
      val (bs, ls) = parseWithLinks(mutated)     // must not throw
      val cs = classify(bs)
      ls.foreach(l => assert(l.anchorWords >= 0))
      cs.foreach(c => assert(Set("good", "bad", "short").contains(c.cls)))
      val cut = base.substring(0, rnd.nextInt(base.length))
      classify(parse(cut)).foreach(c =>
        assert(Set("good", "bad", "short").contains(c.cls)))
    }
  }

  test("spark path: blocksFromDocuments and extractFromDocuments agree " +
    "on kept words at sf0.001") {
    val docs = graft.Tables.documents(spark, sf)
    val blocks = HtmlExtract.blocksFromDocuments(spark, docs)
    val extract = HtmlExtract.extractFromDocuments(spark, docs)
    import org.apache.spark.sql.functions._
    val fromBlocks = blocks.toDF().where(col("keep"))
      .groupBy("doc_id").agg(sum(col("words")).as("kw"))
    val joined = extract.toDF().join(fromBlocks, Seq("doc_id"), "left")
      .where(coalesce(col("kw"), lit(0L)) =!= col("kept_words"))
    assert(joined.count() == 0)
  }
}
