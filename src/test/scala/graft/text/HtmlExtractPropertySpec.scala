package graft.text

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.text.HtmlExtract._

/** Differential property tests for the HTML chain on ADVERSARIAL token
  * content the fixture corpus never produces: tokens containing `&`,
  * `<`, `>`, `"`, half-typed entities (`&amp`, `&#x`), and arbitrary
  * ASCII punctuation. The assembler must escape them into valid markup
  * and the parser must decode back the EXACT original tokens — the
  * escape→decode round-trip is an identity on every printable token
  * stream, and block structure stays the closed-form the oracle
  * assumes. */
class HtmlExtractPropertySpec extends AnyFunSuite {

  // printable-ASCII tokens (no whitespace), biased toward markup traps
  private val trap = Gen.oneOf("&", "<", ">", "\"", "&amp;", "&amp",
    "&#65;", "&#x41;", "&bogus;", "<p>", "</p>", "a<b", "x&y", "1<2>3",
    "q\"q", "&&&", ";&;")
  private val plain = Gen.chooseNum(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(33, 126).map(_.toChar))
      .map(_.mkString))
  private val token = Gen.frequency(1 -> trap, 3 -> plain)

  private val input: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 5000L)
    n <- Gen.chooseNum(10, 60)
    toks <- Gen.listOfN(n, token)
  } yield (id, toks.mkString(" "))

  test("escape -> parse round-trip: paragraph tokens survive exactly, " +
    "block structure stays the oracle's closed form") {
    val prop = Prop.forAll(input) { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toVector
      val n = toks.length
      val nb = 2 + (id % 3).toInt
      val nli = 2 + (id % 2).toInt
      val cs = classify(parse(fixtureHtml(id, text)))
      // structural census: title + nav + h1 + nb paragraphs + qa + footer
      val structureOk = cs.length == 1 + nli + 1 + nb + 2
      // every paragraph's words equal the exact token slice (p0 plus
      // the link suffix) — the escape/decode identity
      val parasOk = (0 until nb).forall { i =>
        val want0 = toks.slice(i * n / nb, (i + 1) * n / nb)
        val want = if (i == 0)
          want0 ++ Vector("see", "the", "reference", "for", "more")
        else want0
        cs(1 + nli + 1 + i).block.words == want
      }
      val linkCountsOk = cs(1 + nli + 1).block.linkWords == 2 &&
        (1 until nb).forall(i => cs(1 + nli + 1 + i).block.linkWords == 0)
      structureOk && parasOk && linkCountsOk
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("link harvesting is content-independent: adversarial tokens " +
    "never corrupt the href set") {
    val prop = Prop.forAll(input) { case (id, text) =>
      val (_, links) = parseWithLinks(fixtureHtml(id, text))
      val nli = 2 + (id % 2).toInt
      links.length == nli + 4 &&
        links(nli).href == s"/doc/${(id * 7 + 1) % 1000}" &&
        links.last.href == "../legal/./terms#top"
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
