package graft.sources

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500 / the WARC/1.0 format every public
  * crawl corpus ships — Common Crawl's storage layer) — writer + lenient
  * reader for the record framing a crawl pipeline ingests:
  *
  *  - record = version line `WARC/1.0` CRLF, named headers (notably
  *    WARC-Type, WARC-Target-URI, Content-Length), empty line, exactly
  *    Content-Length payload bytes, CRLF CRLF record separator;
  *  - files are plain concatenations of records OR per-record gzip
  *    members concatenated (the Common Crawl .warc.gz layout — the
  *    member-per-record discipline is what makes a 100 TB archive
  *    splittable: a reader can start at any member boundary);
  *  - response records carry an HTTP/1.1 message as payload; the HTML
  *    body begins after the first CRLF CRLF.
  *
  * The reader is LENIENT the way a crawl ingester must be: header names
  * case-insensitive, unparseable or truncated records end the scan
  * (returning everything before them), Content-Length is trusted only
  * within the buffer's bounds, and gzip streams that die mid-member
  * yield the records already decoded. Never throws on hostile bytes
  * (WarcSpec fuzzes).
  *
  * No reference analog (builder-brief extension); format per the public
  * ISO 28500 / WARC 1.0 specification. */
object Warc {

  final case class WarcRecord(warcType: String, targetUri: Option[String],
                              headers: Map[String, String],
                              payload: Array[Byte])

  private val CRLF = "\r\n"

  /** Serialize one record (headers get Content-Length appended). */
  def record(warcType: String, uri: Option[String],
             extra: Seq[(String, String)], payload: Array[Byte])
      : Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "WARC/1.0" ++= CRLF
    sb ++= s"WARC-Type: $warcType" ++= CRLF
    uri.foreach(u => sb ++= s"WARC-Target-URI: $u" ++= CRLF)
    extra.foreach { case (k, v) => sb ++= s"$k: $v" ++= CRLF }
    sb ++= s"Content-Length: ${payload.length}" ++= CRLF
    sb ++= CRLF
    sb.toString.getBytes("UTF-8") ++ payload ++
      (CRLF + CRLF).getBytes("UTF-8")
  }

  /** Gzip one record as its own member (the .warc.gz discipline). */
  def gzipMember(rec: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec); gz.close()
    bos.toByteArray
  }

  /** Decompress a concatenation of gzip members; on a corrupt tail,
    * return what decoded so far. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: Exception => () }
    out.toByteArray
  }

  /** Parse a WARC file (plain or .gz member-concatenation — sniffed by
    * the gzip magic). Lenient: stops at the first structurally broken
    * record. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1f &&
          (bytes(1) & 0xFF) == 0x8b) gunzipAll(bytes)
      else bytes
    val out = ArrayBuffer.empty[WarcRecord]
    var i = 0
    while (i < plain.length) {
      parseOne(plain, i) match {
        case Some((rec, next)) => out += rec; i = next
        case None => i = plain.length
      }
    }
    out.toSeq
  }

  /** Read one CRLF- (or bare-LF-) terminated line as ISO-8859-1;
    * returns (line-without-terminator, index-after). */
  private def line(b: Array[Byte], from: Int): Option[(String, Int)] = {
    var j = from
    while (j < b.length && b(j) != '\n') j += 1
    if (j >= b.length) return None
    val end = if (j > from && b(j - 1) == '\r') j - 1 else j
    Some((new String(b, from, end - from, "ISO-8859-1"), j + 1))
  }

  private def parseOne(b: Array[Byte], from: Int)
      : Option[(WarcRecord, Int)] = {
    var i = from
    // skip inter-record CRLFs
    while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
    val (version, afterV) = line(b, i).getOrElse(return None)
    if (!version.startsWith("WARC/")) return None
    var j = afterV
    var headers = Map.empty[String, String]
    var done = false
    while (!done) {
      val (l, next) = line(b, j).getOrElse(return None)
      j = next
      if (l.isEmpty) done = true
      else {
        val c = l.indexOf(':')
        if (c > 0)
          headers += l.substring(0, c).trim.toLowerCase ->
            l.substring(c + 1).trim
      }
    }
    val len = headers.get("content-length")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(return None)
    if (len < 0 || j + len > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, j, j + len.toInt)
    Some((WarcRecord(
      headers.getOrElse("warc-type", ""),
      headers.get("warc-target-uri"), headers, payload),
      j + len.toInt))
  }

  // -------------------------------------------------------------------
  // Fixture + Spark plumbing: the Common Crawl ingest chain
  // WARC → HTTP → HTML → extraction, end to end per document.
  // -------------------------------------------------------------------

  /** Deterministic fixture WARC file for (docId, text): warcinfo +
    * request + response records (the Common Crawl triple), the response
    * payload a genuine HTTP/1.1 message whose body is the HTML fixture
    * page; odd ids gzip each record as its own member (.warc.gz). */
  def fixtureWarc(docId: Long, text: String): Array[Byte] = {
    val host = s"site${docId % 7}.example.com"
    val uri = s"http://$host/doc/$docId"
    val date = Seq("WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:uuid:doc-$docId>")
    val info = record("warcinfo", None, date,
      "software: graft-crawler/1.0\r\n".getBytes("UTF-8"))
    val req = record("request", Some(uri), date,
      (s"GET /doc/$docId HTTP/1.1\r\nHost: $host\r\n\r\n")
        .getBytes("UTF-8"))
    val html = graft.text.HtmlExtract.fixtureHtml(docId, text)
    val resp = record("response", Some(uri), date,
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "\r\n").getBytes("UTF-8") ++ html.getBytes("UTF-8"))
    val recs = Seq(info, req, resp)
    if (docId % 2 == 1) recs.map(gzipMember).reduce(_ ++ _)
    else recs.reduce(_ ++ _)
  }

  /** One ingested crawl page: WARC record census, the response's HTTP
    * envelope, and the extraction result of its HTML body — which must
    * equal text_html_extract's sha for the same document, gating the
    * whole container chain. */
  final case class WarcIngestRow(doc_id: Long, n_records: Int,
      gzipped: Boolean, target_uri: String, http_status: Int,
      content_type: String, n_kept: Int, extract_sha: String)

  /** source_warc: assemble → (maybe gzip) → parse WARC → parse HTTP →
    * parse HTML → classify → extract, all inside the input partitions —
    * the narrow one-pass shape at crawl scale (member-per-record gzip
    * is what makes the real 100 TB archives splittable). */
  def ingestFromDocuments(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[WarcIngestRow] = {
    import org.apache.spark.sql.functions.col
    import s.implicits._
    // conditional spread before the CPU-bound assemble/gzip/parse chain
    // (see Spread.forCpu) — a single-split scan would serialize it; a
    // well-split crawl archive passes through exchange-free
    graft.operators.Spread.forCpu(
      docs.select(col("doc_id"), col("text")).as[(Long, String)])
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val recs = parse(fixtureWarc(id, text))
          for {
            resp <- recs.find(_.warcType == "response").iterator
            (code, hh, body) <- parseHttp(resp.payload).iterator
          } yield {
            val cs = graft.text.HtmlExtract.classify(
              graft.text.HtmlExtract.parse(new String(body, "UTF-8")))
            WarcIngestRow(id, recs.length, id % 2 == 1,
              resp.targetUri.getOrElse(""), code,
              hh.getOrElse("content-type", ""),
              cs.count(_.keep),
              graft.text.HtmlExtract.sha256Hex(
                graft.text.HtmlExtract.extractText(cs)))
          }
        }
      }
  }

  /** The corpus-build ingest: the same container → HTTP → HTML →
    * extract chain as [[ingestFromDocuments]], but yielding the
    * extracted main-content TEXT itself — the stage-zero output the
    * corpus_build_e2e pipeline consumes in the SAME narrow pass (no
    * shuffle between ingest and the downstream normalize). */
  def extractedFromDocuments(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[(Long, String)] = {
    import org.apache.spark.sql.functions.col
    import s.implicits._
    graft.operators.Spread.forCpu(
      docs.select(col("doc_id"), col("text")).as[(Long, String)])
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val recs = parse(fixtureWarc(id, text))
          for {
            resp <- recs.find(_.warcType == "response").iterator
            (_, _, body) <- parseHttp(resp.payload).iterator
          } yield (id, graft.text.HtmlExtract.extractText(
            graft.text.HtmlExtract.classify(
              graft.text.HtmlExtract.parse(new String(body, "UTF-8")))))
        }
      }
  }

  /** Split an HTTP/1.1 message payload into (status code, headers,
    * body); None when no status line / header terminator exists. */
  def parseHttp(payload: Array[Byte])
      : Option[(Int, Map[String, String], Array[Byte])] = {
    val (status, afterS) = line(payload, 0).getOrElse(return None)
    val parts = status.split(" ")
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val code = scala.util.Try(parts(1).toInt).toOption.getOrElse(return None)
    var j = afterS
    var headers = Map.empty[String, String]
    var done = false
    while (!done) {
      val (l, next) = line(payload, j) match {
        case Some(x) => x
        case None => return Some((code, headers,
          Array.emptyByteArray)) // headers ran to EOF: empty body
      }
      j = next
      if (l.isEmpty) done = true
      else {
        val c = l.indexOf(':')
        if (c > 0)
          headers += l.substring(0, c).trim.toLowerCase ->
            l.substring(c + 1).trim
      }
    }
    Some((code, headers,
      java.util.Arrays.copyOfRange(payload, j, payload.length)))
  }
}
