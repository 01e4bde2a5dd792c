package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import scala.collection.mutable.ArrayBuffer

/** Per-block record emitted by text_html_blocks (all stats exact
  * integers; `ld_millis` = 1000·link_words div words). */
final case class HtmlBlockRow(doc_id: Long, block_id: Int, tag: String,
    words: Int, link_words: Int, stop_words: Int, chars: Int,
    ld_millis: Int, cls: String, keep: Boolean)

/** One harvested outlink of text_html_links: document order, the
  * entity-decoded href, and the anchor word count. */
final case class HtmlLinkRow(doc_id: Long, link_ord: Int, href: String,
    anchor_words: Int)

/** Per-document ingest stats over the EXTRACTED content (the
  * stage-zero → stage-one composition of a crawl pipeline): token
  * count, total word length, stopword count — the exact-integer inputs
  * of the quality formula. */
final case class HtmlIngestRow(doc_id: Long, n_tokens: Long,
    sum_len: Long, n_stop: Long)

/** Per-document record emitted by text_html_extract: block counts plus
  * the sha256 of the extracted main content (kept blocks' canonical
  * texts joined by '\n') — the strongest oracle gate: DuckDB rebuilds
  * the exact extracted string and hashes it. */
final case class HtmlExtractRow(doc_id: Long, n_blocks: Int, n_kept: Int,
    kept_words: Long, kept_chars: Long, extract_sha: String)

/** HTML main-content extraction — the stage-zero operator of every
  * crawl-scale corpus pipeline (C4 / RefinedWeb / FineWeb all begin by
  * extracting main content from raw HTML before any dedup or quality
  * filter runs).
  *
  * Two genuinely separate pieces live here:
  *
  *  1. [[HtmlExtract.parse]] — a single-pass streaming HTML tokenizer +
  *     block segmenter that works on ARBITRARY HTML: tag/attribute
  *     scanning with quoted-value handling (a `>` inside a quoted
  *     attribute does not close the tag), `<script>`/`<style>` raw-text
  *     modes (their content is dropped, and `<` / `</div>` inside them
  *     do not open tags), comment and DOCTYPE skipping, character-entity
  *     decoding (named + numeric), and block segmentation at block-level
  *     element boundaries with an `<a>`-depth counter so every word
  *     knows whether it is link text.
  *
  *  2. [[HtmlExtract.classify]] — a deterministic jusText/Kohlschuetter-
  *     style block classifier in EXACT integer arithmetic (no floats, so
  *     a SQL oracle replays every decision): a block is
  *       - `bad`   when link density exceeds 1/3 (3·linkWords > words),
  *       - `short` when words < 8 (undecided, resolved by context),
  *       - `good`  when stopword density ≥ 4% (25·stopWords ≥ words),
  *       - `bad`   otherwise (long, link-free, but stopword-poor —
  *         the Kohlschuetter boilerplate signature);
  *     then the jusText context pass promotes a `short` block to kept
  *     iff its nearest DECIDED neighbor (previous or next non-short
  *     block in document order) is `good`.
  *
  * Scale shape: extraction is a NARROW ONE-PASS — each document's HTML
  * is parsed inside its input partition, raw markup never shuffles, and
  * only integer block stats (or a sha256 of the extracted text) leave
  * the stage. At 100 TB this is a map-only job bounded by scan + CPU.
  *
  * The oracle-gated entries (text_html_blocks / text_html_extract) run
  * the parser over AUTHORED fixture pages assembled deterministically
  * from the documents table ([[HtmlExtract.fixtureHtml]]) — the codec
  * precedent: the assembler is the encoder, the parser must invert it
  * exactly, and DuckDB replays the block structure + classification +
  * extracted-text sha256 from the same parameters without parsing HTML.
  * HtmlExtractSpec additionally drives the parser over hostile
  * non-fixture markup (unclosed tags, nested links, entities, script
  * containing fake close tags, attribute `>` traps, truncation/mutation
  * fuzz) where no oracle can reach.
  *
  * No reference analog (builder-brief extension beyond
  * /root/reference/): algorithms follow the published jusText
  * (Pomikalek 2011) and boilerpipe (Kohlschuetter WSDM 2010) rules.
  */
object HtmlExtract {

  /** One extracted outlink: the (entity-decoded) href value and the
    * number of anchor words inside the link — the crawl-graph record
    * (outlink harvesting feeds frontier scheduling and link-authority
    * signals like PageRank). */
  final case class Link(href: String, anchorWords: Int)

  /** One text block with integer stats. `ldMillis` = 1000·link/words
    * (integer division — exact in both engines). */
  final case class Block(tag: String, words: Vector[String],
                         linkWords: Int, stopWords: Int) {
    def nWords: Int = words.length
    /** Canonical text: words joined by single spaces (whitespace runs
      * and inline markup normalized away). */
    def text: String = words.mkString(" ")
    def chars: Int = if (words.isEmpty) 0
      else words.map(_.length).sum + words.length - 1
    def ldMillis: Int = if (nWords == 0) 1000 else 1000 * linkWords / nWords
  }

  /** Block + resolved classification. */
  final case class Classified(block: Block, cls: String, keep: Boolean)

  /** Elements whose open OR close tag terminates the current text block
    * (jusText's block boundary set). Everything else is inline. */
  private val blockTags: Set[String] = Set(
    "html", "head", "body", "title", "div", "p", "h1", "h2", "h3", "h4",
    "h5", "h6", "ul", "ol", "li", "dl", "dt", "dd", "table", "thead",
    "tbody", "tr", "td", "th", "blockquote", "pre", "header", "footer",
    "nav", "section", "article", "aside", "main", "figure", "figcaption",
    "form", "fieldset", "br", "hr")

  /** Raw-text elements: content is NOT markup and is dropped entirely. */
  private val rawTextTags: Set[String] = Set("script", "style")

  /** The engine-wide stoplist (same 7 words textQuality uses). */
  val stopWords: Set[String] =
    Set("the", "a", "and", "of", "to", "is", "in")

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode the entity starting at `i` (the position of '&').
    * Returns (decoded text, index after the entity). Unknown or
    * malformed entities are left literally — the lenient-parser rule. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#x") || body.startsWith("#X")) {
      try { (new String(Character.toChars(
          Integer.parseInt(body.substring(2), 16))), semi + 1) }
      catch { case _: Exception => ("&", i + 1) }
    } else if (body.startsWith("#")) {
      try { (new String(Character.toChars(
          Integer.parseInt(body.substring(1)))), semi + 1) }
      catch { case _: Exception => ("&", i + 1) }
    } else namedEntities.get(body.toLowerCase) match {
      case Some(t) => (t, semi + 1)
      case None    => ("&", i + 1)
    }
  }

  /** Decode entities in an attribute value (the HTML rule: attribute
    * values are entity-encoded like text). */
  private def decodeValue(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (t, n) = decodeEntity(s, i); sb ++= t; i = n
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** Parse a tag's attributes from just after the tag name: returns
    * (attributes, index after '>'). Quoted values may contain '>' and
    * '='; unquoted values end at whitespace or '>'; bare names map to
    * "". Lenient on truncation. */
  private def parseAttrs(html: String, from: Int)
      : (Map[String, String], Int) = {
    val n = html.length
    var j = from
    var attrs = Map.empty[String, String]
    while (j < n && html.charAt(j) != '>') {
      while (j < n && (html.charAt(j).isWhitespace || html.charAt(j) == '/'))
        j += 1
      if (j >= n || html.charAt(j) == '>') return (attrs, math.min(j + 1, n))
      val nameStart = j
      while (j < n && !html.charAt(j).isWhitespace &&
             html.charAt(j) != '=' && html.charAt(j) != '>' &&
             html.charAt(j) != '/') j += 1
      val name = html.substring(nameStart, j).toLowerCase
      while (j < n && html.charAt(j).isWhitespace) j += 1
      if (j < n && html.charAt(j) == '=') {
        j += 1
        while (j < n && html.charAt(j).isWhitespace) j += 1
        if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
          val q = html.charAt(j); j += 1
          val vs = j
          while (j < n && html.charAt(j) != q) j += 1
          if (name.nonEmpty)
            attrs += name -> decodeValue(html.substring(vs, math.min(j, n)))
          j += 1
        } else {
          val vs = j
          while (j < n && !html.charAt(j).isWhitespace &&
                 html.charAt(j) != '>') j += 1
          if (name.nonEmpty)
            attrs += name -> decodeValue(html.substring(vs, j))
        }
      } else if (name.nonEmpty) attrs += name -> ""
    }
    (attrs, math.min(j + 1, n))
  }

  /** Single-pass parse of `html` into nonempty text blocks. Never
    * throws on malformed input: unclosed tags, stray '<'/'&', and
    * truncated markup all degrade to text or are skipped. */
  def parse(html: String): Vector[Block] = parseWithLinks(html)._1

  /** Parse into (blocks, outlinks): blocks as [[parse]]; outlinks are
    * href-bearing `<a>` elements in DOCUMENT ORDER with their
    * entity-decoded href and anchor word count (a word is attributed
    * to the innermost link open when the word ends — exact whenever
    * markup doesn't split words across link boundaries). */
  def parseWithLinks(html: String): (Vector[Block], Vector[Link]) = {
    val out = ArrayBuffer.empty[Block]
    val words = ArrayBuffer.empty[String]
    val word = new StringBuilder
    var wordInLink = false      // link depth > 0 at the word's first char
    var linkWords = 0
    var linkDepth = 0
    // outlink records in document (open) order + the open-link stack
    final class LinkB(val href: Option[String]) { var words = 0 }
    val linkRecs = ArrayBuffer.empty[LinkB]
    val linkStack = scala.collection.mutable.Stack.empty[LinkB]
    var curTag = "body"         // innermost open block-level element
    var blockTag = "body"       // tag recorded when current block began
    val n = html.length
    var i = 0

    def endWord(): Unit = if (word.nonEmpty) {
      if (words.isEmpty) blockTag = curTag
      words += word.toString
      if (wordInLink) {
        linkWords += 1
        if (linkStack.nonEmpty) linkStack.top.words += 1
      }
      word.clear()
    }
    def flush(): Unit = {
      endWord()
      if (words.nonEmpty) {
        val ws = words.toVector
        out += Block(blockTag, ws, linkWords,
          ws.count(w => stopWords.contains(w)))
        words.clear(); linkWords = 0
      }
    }
    def appendChar(c: Char): Unit = {
      if (word.isEmpty) wordInLink = linkDepth > 0
      word += c
    }
    /** Skip past the current tag's attributes (from just after the tag
      * name) honoring quoted values; returns index after '>'. */
    def skipAttrs(from: Int): Int = {
      var j = from
      while (j < n) {
        html.charAt(j) match {
          case '"' =>
            j += 1; while (j < n && html.charAt(j) != '"') j += 1; j += 1
          case '\'' =>
            j += 1; while (j < n && html.charAt(j) != '\'') j += 1; j += 1
          case '>' => return j + 1
          case _   => j += 1
        }
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {            // comment
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' ||
                                 html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i)               // doctype / PI
          i = if (e < 0) n else e + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // HTML5 tokenizer rule: a tag open requires an ASCII letter
          // after '<' (or '</') — "1 < 2" and "3<4" are text.
          if (name.isEmpty || !Character.isLetter(html.charAt(nameStart))) {
            appendChar(c); i += 1
          } else {
            // an opening <a> parses its attributes (href harvesting);
            // every other tag skips them
            var href = Option.empty[String]
            if (!closing && name == "a") {
              val (attrs, next) = parseAttrs(html, j)
              href = attrs.get("href")
              i = next
            } else i = skipAttrs(j)
            if (!closing && rawTextTags.contains(name)) {
              // raw-text mode: drop everything to the matching close tag.
              // Case-insensitive scan via regionMatches — lowercasing the
              // whole document per script tag would be O(n^2) on
              // script-heavy pages.
              val close = s"</$name"
              var e = -1
              var k = i
              while (e < 0 && k <= n - close.length) {
                if (html.regionMatches(true, k, close, 0, close.length))
                  e = k
                k += 1
              }
              if (e < 0) i = n
              else {
                val after = html.indexOf('>', e)
                i = if (after < 0) n else after + 1
              }
            } else if (blockTags.contains(name)) {
              flush()
              if (!closing) curTag = name
              else curTag = "body"   // lenient: no open-stack reconstruction
            } else if (name == "a") {
              endWord()              // a tag boundary ends the word run
              if (closing) {
                linkDepth = math.max(0, linkDepth - 1)
                if (linkStack.nonEmpty) linkStack.pop()
              } else {
                linkDepth += 1
                val b = new LinkB(href)
                linkRecs += b
                linkStack.push(b)
              }
            } else {
              endWord()              // inline tag: word boundary only
            }
          }
        }
      } else if (c == '&') {
        val (txt, next) = decodeEntity(html, i)
        txt.foreach { t =>
          if (t.isWhitespace) endWord() else appendChar(t)
        }
        i = next
      } else if (c.isWhitespace) {
        endWord(); i += 1
      } else {
        appendChar(c); i += 1
      }
    }
    flush()
    (out.toVector, linkRecs.iterator.filter(_.href.isDefined)
      .map(b => Link(b.href.get, b.words)).toVector)
  }

  /** Context-free class: bad / short / good (exact integer rules — see
    * object doc). */
  def contextFreeClass(b: Block): String =
    if (3 * b.linkWords > b.nWords) "bad"
    else if (b.nWords < 8) "short"
    else if (25 * b.stopWords >= b.nWords) "good"
    else "bad"

  /** jusText context pass: short blocks inherit keep from the nearest
    * decided (non-short) neighbor in either direction. */
  def classify(blocks: Vector[Block]): Vector[Classified] = {
    val cls = blocks.map(contextFreeClass)
    val prevDecided = cls.scanLeft(Option.empty[String]) {
      (acc, c) => if (c != "short") Some(c) else acc
    }
    val nextDecided = cls.scanRight(Option.empty[String]) {
      (c, acc) => if (c != "short") Some(c) else acc
    }
    blocks.indices.toVector.map { k =>
      val keep = cls(k) match {
        case "good"  => true
        case "bad"   => false
        case _ =>
          prevDecided(k).getOrElse("bad") == "good" ||
          nextDecided(k + 1).getOrElse("bad") == "good"
      }
      Classified(blocks(k), cls(k), keep)
    }
  }

  /** Extracted main content: canonical texts of kept blocks joined by
    * newlines (the C4-style output document). */
  def extractText(classified: Vector[Classified]): String =
    classified.filter(_.keep).map(_.block.text).mkString("\n")

  // -------------------------------------------------------------------
  // Fixture assembler — the deterministic "encoder" the oracle replays.
  // -------------------------------------------------------------------

  /** Escape text content for embedding in HTML (identity on the fixture
    * corpus, but the parse side must decode it — a real code path). */
  def escape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")

  private val navCatalog = Vector(
    ("home", "/home?x=1&amp;y=2"), ("about us", "/about"),
    ("contact", "/contact"))

  /** Deterministic fixture page for (docId, text):
    *  - head with title, a style block whose comment contains fake
    *    markup, and a script whose string literal contains "</div>" and
    *    an unquoted '<' — the classic raw-text traps;
    *  - an HTML comment containing fake block markup;
    *  - a nav list of 2 + docId % 2 pure-link items (hrefs with
    *    entities; one title attribute containing '>');
    *  - an h1 with an inline <em>;
    *  - nb = 2 + docId % 3 content paragraphs over the contiguous
    *    token slices para_i = toks[⌊i·n/nb⌋, ⌊(i+1)·n/nb⌋); paragraph 0
    *    gains the suffix `see <a ...>the reference</a> for more`
    *    (2 link words, 1 extra stopword);
    *  - a Q&amp;A paragraph exercising named + numeric entities;
    *  - a footer with 50% link density.
    * Every structural parameter is a pure function of docId, every word
    * a token slice or literal — the DuckDB oracle rebuilds all block
    * stats and the extracted text without an HTML parser. */
  def fixtureHtml(docId: Long, text: String): String = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val nb = 2 + (docId % 3).toInt
    val nav = navCatalog.take(2 + (docId % 2).toInt)
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html>\n<head>\n"
    sb ++= s"<title>Doc $docId</title>\n"
    sb ++= "<style>body { color: #333; } /* <p>not a block</p> */</style>\n"
    sb ++= "<script type=\"text/javascript\">var s = \"</div> <p>\"; " +
      "if (1 < 2) { s = s + \"x\"; }</script>\n"
    sb ++= "</head>\n<body>\n"
    sb ++= "<!-- nav menu <p>commented out</p> -->\n"
    sb ++= "<div class=\"nav\"><ul>\n"
    nav.foreach { case (label, href) =>
      sb ++= s"""<li><a href="$href">$label</a></li>\n"""
    }
    sb ++= "</ul></div>\n"
    sb ++= s"<h1>Doc $docId <em>report</em></h1>\n"
    for (i <- 0 until nb) {
      val para = toks.slice(i * n / nb, (i + 1) * n / nb)
      val body = escape(para.mkString(" "))
      if (i == 0) {
        // deterministic cross-document link — the linkgraph fixture edge
        val target = (docId * 7 + 1) % 1000
        sb ++= s"""<p id="p$i">$body see """ +
          s"""<a href="/doc/$target" title="a > b">""" +
          "the reference</a> for more</p>\n"
      }
      else sb ++= s"""<p id="p$i">$body</p>\n"""
    }
    sb ++= "<p class=\"qa\">Q&amp;A &quot;quoted&quot; &#8212; " +
      "the answer is in the text</p>\n"
    sb ++= "<div class=\"footer\">copyright 2026 " +
      "<a href=\"/terms\">terms</a> <a href=\"/privacy\">privacy</a>" +
      // anchor-less icon link with relative path, dot segments, and a
      // fragment — exercises URL resolution in the oracle without
      // touching any block's word stats
      "<a href=\"../legal/./terms#top\"></a></div>\n"
    sb ++= "</body>\n</html>\n"
    sb.toString
  }

  // -------------------------------------------------------------------
  // Spark plumbing — narrow one-pass over the documents partitions.
  // -------------------------------------------------------------------

  private[graft] def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docPairs(s: SparkSession, docs: DataFrame)
      : Dataset[(Long, String)] = {
    import s.implicits._
    // Spread the input across cores BEFORE the CPU-bound parse — but
    // ONLY when the scan under-splits (Spread.forCpu): a compact
    // parquet corpus can arrive as ONE split, which would single-thread
    // the whole extraction (measured: source_warc 4.1s -> ~1s at
    // sf0.1), while a crawl-scale corpus already arrives in more splits
    // than cores and must NOT pay a full-corpus exchange of raw text.
    graft.operators.Spread.forCpu(
      docs.select(col("doc_id"), col("text")).as[(Long, String)])
  }

  /** text_html_blocks: assemble → parse → classify, one pass inside the
    * input partitions; only integer stat rows leave the stage (markup
    * and block text never shuffle). */
  def blocksFromDocuments(s: SparkSession, docs: DataFrame)
      : Dataset[HtmlBlockRow] = {
    import s.implicits._
    docPairs(s, docs).mapPartitions { it =>
      it.flatMap { case (id, text) =>
        classify(parse(fixtureHtml(id, text))).zipWithIndex.map {
          case (c, k) => HtmlBlockRow(id, k, c.block.tag, c.block.nWords,
            c.block.linkWords, c.block.stopWords, c.block.chars,
            c.block.ldMillis, c.cls, c.keep)
        }
      }
    }
  }

  /** text_html_links: outlink harvesting — the crawl-graph operator
    * (frontier scheduling, link-authority signals). Same narrow
    * one-pass shape: hrefs and anchor counts leave the stage, markup
    * never does. */
  def linksFromDocuments(s: SparkSession, docs: DataFrame)
      : Dataset[HtmlLinkRow] = {
    import s.implicits._
    docPairs(s, docs).mapPartitions { it =>
      it.flatMap { case (id, text) =>
        parseWithLinks(fixtureHtml(id, text))._2.zipWithIndex.map {
          case (l, k) => HtmlLinkRow(id, k, l.href, l.anchorWords)
        }
      }
    }
  }

  /** text_html_pipeline's map side: extraction composed with the
    * downstream ingest statistics IN the same pass — the real pipeline
    * shape (extract → score) pays one scan, not two. */
  def ingestStatsFromDocuments(s: SparkSession, docs: DataFrame)
      : Dataset[HtmlIngestRow] = {
    import s.implicits._
    docPairs(s, docs).mapPartitions { it =>
      it.map { case (id, text) =>
        val words = classify(parse(fixtureHtml(id, text)))
          .filter(_.keep).flatMap(_.block.words)
        HtmlIngestRow(id, words.length.toLong,
          words.map(_.length.toLong).sum,
          words.count(stopWords.contains).toLong)
      }
    }
  }

  /** text_html_extract: same pass reduced to one row per document with
    * the extracted-content sha256 — the per-doc reduction happens IN the
    * map (a document never spans partitions), so this is still shuffle-
    * free up to the final orderBy of 6-column rows. */
  def extractFromDocuments(s: SparkSession, docs: DataFrame)
      : Dataset[HtmlExtractRow] = {
    import s.implicits._
    docPairs(s, docs).mapPartitions { it =>
      it.map { case (id, text) =>
        val cs = classify(parse(fixtureHtml(id, text)))
        val kept = cs.filter(_.keep)
        val extracted = extractText(cs)
        HtmlExtractRow(id, cs.length, kept.length,
          kept.map(_.block.nWords.toLong).sum,
          extracted.length.toLong, sha256Hex(extracted))
      }
    }
  }
}
