package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC container semantics beyond the oracle: framing round-trips,
  * the lenient-reader rules, gzip member handling, and hostile-input
  * fuzz — crawl archives are exactly where truncated and corrupt
  * bytes arrive daily. */
class WarcSpec extends AnyFunSuite {

  private def mkFile(gz: Boolean): Array[Byte] =
    Warc.fixtureWarc(if (gz) 1L else 0L, "the quick brown fox jumps " +
      "over the lazy dog and runs on and on")

  test("round-trip: three records, types in order, headers and payload " +
    "lengths survive both plain and gzip framing") {
    for (gz <- Seq(false, true)) {
      val recs = Warc.parse(mkFile(gz))
      assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response"))
      assert(recs(0).targetUri.isEmpty)
      assert(recs(1).targetUri == recs(2).targetUri)
      assert(recs(2).headers("content-length").toInt ==
        recs(2).payload.length)
    }
  }

  test("http envelope: status, case-insensitive headers, body split at " +
    "the first blank line; headers-to-EOF degrades to empty body") {
    val recs = Warc.parse(mkFile(false))
    val Some((code, hh, body)) = Warc.parseHttp(recs(2).payload)
    assert(code == 200)
    assert(hh("content-type") == "text/html; charset=utf-8")
    assert(new String(body, "UTF-8").startsWith("<!DOCTYPE html>"))
    assert(Warc.parseHttp("HTTP/1.1 301 Moved\r\nLocation: /x"
      .getBytes("UTF-8")).exists(_._1 == 301))
    assert(Warc.parseHttp("not http".getBytes("UTF-8")).isEmpty)
  }

  test("lenient reader: bad version line, missing/absurd content-length, " +
    "and truncated payload end the scan with the good prefix intact") {
    val good = Warc.record("response", Some("http://x/"), Seq.empty,
      "HTTP/1.1 200 OK\r\n\r\nhi".getBytes("UTF-8"))
    val badVersion = "HTTP/1.0\r\n\r\n".getBytes("UTF-8")
    assert(Warc.parse(good ++ badVersion).length == 1)
    val noLen = "WARC/1.0\r\nWARC-Type: metadata\r\n\r\n".getBytes("UTF-8")
    assert(Warc.parse(good ++ noLen).length == 1)
    val hugeLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes("UTF-8")
    assert(Warc.parse(good ++ hugeLen).length == 1)
  }

  test("mutation fuzz: 300 byte flips + truncation sweep over plain and " +
    "gzip files never throw through the full ingest chain") {
    val rnd = new scala.util.Random(99L)
    for (gz <- Seq(false, true)) {
      val base = mkFile(gz)
      def ingest(bytes: Array[Byte]): Unit =
        Warc.parse(bytes).foreach { r =>
          Warc.parseHttp(r.payload).foreach { case (_, _, body) =>
            graft.text.HtmlExtract.classify(
              graft.text.HtmlExtract.parse(new String(body, "UTF-8")))
          }
        }
      for (cut <- 0 until base.length by 13) ingest(base.take(cut))
      for (_ <- 1 to 300) {
        val mut = base.clone()
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
        ingest(mut)
      }
      ingest(Array.fill(256)(rnd.nextInt(256).toByte))
    }
  }

  test("chain gate: the extraction sha through WARC+HTTP equals the " +
    "direct html-extraction sha for the same document") {
    val text = "spark table merge join the sort batch window a key " +
      "value stream filter of data and row column"
    for (id <- Seq(0L, 1L, 5L)) {
      val recs = Warc.parse(Warc.fixtureWarc(id, text))
      val Some((_, _, body)) =
        Warc.parseHttp(recs.find(_.warcType == "response").get.payload)
      val viaWarc = graft.text.HtmlExtract.extractText(
        graft.text.HtmlExtract.classify(
          graft.text.HtmlExtract.parse(new String(body, "UTF-8"))))
      val direct = graft.text.HtmlExtract.extractText(
        graft.text.HtmlExtract.classify(graft.text.HtmlExtract.parse(
          graft.text.HtmlExtract.fixtureHtml(id, text))))
      assert(viaWarc == direct)
    }
  }
}
