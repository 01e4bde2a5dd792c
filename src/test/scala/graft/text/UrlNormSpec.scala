package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 resolution + canonicalization beyond the oracle's fixture
  * hrefs: the reference-resolution table, dot-segment clamping, and the
  * crawl-frontier policies (fragment identity, non-http drops). */
class UrlNormSpec extends AnyFunSuite {

  private val base = "http://a.example.com/b/c/d;p?q"

  private def r(ref: String): String =
    UrlNorm.resolve(base, ref).getOrElse("<none>")

  test("RFC 3986 §5.4.1 normal-example table (hierarchical subset)") {
    assert(r("g") == "http://a.example.com/b/c/g")
    assert(r("./g") == "http://a.example.com/b/c/g")
    assert(r("g/") == "http://a.example.com/b/c/g/")
    assert(r("/g") == "http://a.example.com/g")
    assert(r("//other.org/x") == "http://other.org/x")
    assert(r("?y") == "http://a.example.com/b/c/d;p?y")
    assert(r("g?y") == "http://a.example.com/b/c/g?y")
    assert(r("") == "http://a.example.com/b/c/d;p?q")
    assert(r(".") == "http://a.example.com/b/c/")
    assert(r("..") == "http://a.example.com/b/")
    assert(r("../g") == "http://a.example.com/b/g")
    assert(r("../../g") == "http://a.example.com/g")
  }

  test("§5.4.2 abnormal: excess dot segments clamp at root; dot " +
    "segments inside the path collapse") {
    assert(r("../../../g") == "http://a.example.com/g")
    assert(r("../../../../g") == "http://a.example.com/g")
    assert(r("/./g") == "http://a.example.com/g")
    assert(r("/../g") == "http://a.example.com/g")
    assert(r("g/./h") == "http://a.example.com/b/c/g/h")
    assert(r("g/../h") == "http://a.example.com/b/c/h")
  }

  test("§6.2.2 syntax normalization: scheme/host lowercase, default " +
    "port elision, empty path becomes /") {
    assert(UrlNorm.resolve("http://b/", "HTTP://WWW.Ex.COM:80/P?Q")
      .contains("http://www.ex.com/P?Q"))
    assert(UrlNorm.resolve("http://b/", "HTTPS://Ex.COM:443")
      .contains("https://ex.com/"))
    assert(UrlNorm.resolve("http://b/", "https://ex.com:8443/p")
      .contains("https://ex.com:8443/p"))
    assert(UrlNorm.resolve("HTTP://Base.COM:80/x/y", "z")
      .contains("http://base.com/x/z"))
  }

  test("§6.2.2.1 userinfo is case-sensitive: only the host part of " +
    "the authority lowercases") {
    assert(UrlNorm.resolve("http://b/", "http://User:Pw@Ex.COM:80/p")
      .contains("http://User:Pw@ex.com/p"))
    // '@' inside userinfo: the HOST starts after the LAST '@'
    assert(UrlNorm.resolve("http://b/", "http://A@B@Host.COM/p")
      .contains("http://A@B@host.com/p"))
    assert(UrlNorm.resolve("http://b/", "https://U@Ex.COM:443")
      .contains("https://U@ex.com/"))
  }

  test("crawl-frontier policy: fragments never survive, non-http(s) " +
    "absolute refs drop, bad bases give None") {
    assert(r("g#frag") == "http://a.example.com/b/c/g")
    assert(r("#frag") == "http://a.example.com/b/c/d;p?q")
    assert(UrlNorm.resolve(base, "mailto:x@y.com").isEmpty)
    assert(UrlNorm.resolve(base, "javascript:void(0)").isEmpty)
    assert(UrlNorm.resolve("not-a-url", "/x").isEmpty)
    assert(UrlNorm.resolve("mailto:x@y.com", "/x").isEmpty)
  }

  test("hostile input: truncated/odd refs never throw and stay " +
    "deterministic") {
    val odd = Seq("", "?", "#", "//", "///", "a//b", "....//", "/..",
      "..", "%2e%2e/x", "http://", "https://:8080/x", " ")
    odd.foreach(refStr => UrlNorm.resolve(base, refStr)) // no throw
    // a network-path ref with an empty authority degrades leniently
    assert(r("//") == "http://")
    assert(UrlNorm.resolve(base, "http://").contains("http://"))
    assert(UrlNorm.resolve("x:foo", "/x").isEmpty) // authority-less base
  }
}
