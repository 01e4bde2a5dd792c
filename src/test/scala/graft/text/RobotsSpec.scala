package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.text.RobotsTxt._

/** RFC 9309 semantics beyond the oracle's fixture: group selection,
  * wildcard/anchor matching, longest-match precedence, and hostile
  * input. */
class RobotsSpec extends AnyFunSuite {

  test("group selection: specific agent beats *, consecutive " +
    "User-agent lines share a group, unknown directives close the run") {
    val txt = """User-agent: alpha
                |User-agent: graftbot
                |Disallow: /a
                |
                |User-agent: *
                |Disallow: /
                |""".stripMargin
    assert(parse(txt, "graftbot") == Seq(Rule(false, "/a")))
    assert(parse(txt, "GRAFTBOT") == Seq(Rule(false, "/a")))
    assert(parse(txt, "other") == Seq(Rule(false, "/")))
    // no matching group at all -> empty rules -> default allow
    assert(decide(parse("User-agent: x\nDisallow: /", "graftbot"), "/y")
      == (true, ""))
  }

  test("pattern matching: prefix, mid wildcards in order, trailing $ " +
    "anchor, $ with trailing wildcard") {
    assert(matches("/a", "/a/b"))
    assert(!matches("/a/b", "/a"))
    assert(matches("/*?x=", "/home?x=1"))
    assert(!matches("/*?x=", "/home?y=1&z=2"))
    assert(matches("/a*c*e", "/abcde"))
    assert(!matches("/a*e*c", "/abcde"))
    assert(matches("/privacy$", "/privacy"))
    assert(!matches("/privacy$", "/privacy2"))
    assert(matches("/a*$", "/abc"))
    // first segment anchors at the START (prefix rule), not anywhere
    assert(!matches("/doc/", "/x/doc/"))
  }

  test("wildcard + $ combined: the last literal matches end-anchored, " +
    "not at its leftmost occurrence") {
    // the leftmost '.php' ends mid-path; the anchor must re-match at
    // the END (a greedy-leftmost walk would bypass this Disallow)
    assert(matches("/*.php$", "/a.php.php"))
    assert(matches("/*.php$", "/a.php"))
    assert(!matches("/*.php$", "/a.php?x=1"))
    assert(!matches("/*.php$", "/a.phpx"))
    // the end-anchored match may not overlap segments already consumed
    assert(!matches("/ab*b$", "/ab"))
    assert(matches("/ab*b$", "/abb"))
    assert(matches("/a*b*c$", "/aXbYbZc"))
  }

  test("precedence: longest pattern wins; allow beats disallow on " +
    "ties; no match defaults to allow") {
    val rules = Seq(Rule(false, "/doc/"), Rule(true, "/doc/1"))
    assert(decide(rules, "/doc/123") == (true, "/doc/1"))
    assert(decide(rules, "/doc/234") == (false, "/doc/"))
    assert(decide(rules, "/other") == (true, ""))
    val tie = Seq(Rule(false, "/ab"), Rule(true, "/cd"))
    assert(decide(Seq(Rule(false, "/x"), Rule(true, "/x")), "/xy")
      == (true, "/x"))
    assert(decide(tie, "/zz") == (true, ""))
  }

  test("fixture decisions match the oracle table for every site") {
    for (k <- 0L until 7L) {
      val rules = parse(fixtureRobots(k), "graftbot")
      assert(decide(rules, "/home?x=1&y=2") == (false, "/*?x="))
      assert(decide(rules, "/about") == (true, ""))
      assert(decide(rules, "/privacy") == (false, "/privacy$"))
      assert(decide(rules, "/legal/terms") == (true, ""))
      assert(decide(rules, s"/doc/${k}99") == (true, s"/doc/$k"))
      val otherDigit = (k + 1) % 7
      assert(decide(rules, s"/doc/${otherDigit}99") == (false, "/doc/"))
    }
  }

  test("hostile input: comments, junk, empty values, and mutation fuzz " +
    "never throw and decisions stay total") {
    val base = fixtureRobots(3L)
    assert(parse("# only comments\n\nDisallow: /orphan\n", "graftbot")
      .isEmpty) // rules before any User-agent belong to no group
    assert(parse("User-agent: graftbot\nDisallow:\n", "graftbot")
      .isEmpty) // empty Disallow value is a no-op
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 300) {
      val arr = base.toCharArray
      arr(rnd.nextInt(arr.length)) = (rnd.nextInt(94) + 33).toChar
      val rules = parse(new String(arr), "graftbot")
      val (allowed, rule) = decide(rules, "/doc/399")
      assert(rule != null && (allowed || !allowed))
    }
    for (cut <- 0 until base.length by 11)
      decide(parse(base.substring(0, cut), "graftbot"), "/x")
  }
}
