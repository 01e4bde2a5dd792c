package graft.text

/** robots.txt (RFC 9309) — the crawl politeness gate: before a frontier
  * URL is fetched, the site's robots rules decide allow/deny. Implements
  * the published matching rules:
  *
  *  - group selection: the group whose User-agent token matches the
  *    crawler (case-insensitive) — all matching groups' rules merge; the
  *    `*` group applies only when no specific group matched;
  *  - path matching: byte-wise prefix with `*` wildcards (any sequence)
  *    and a trailing `$` end anchor; the pattern is matched against the
  *    URL's path + query;
  *  - precedence: the LONGEST matching pattern wins (octet length, the
  *    RFC's most-specific rule); on equal lengths allow beats disallow;
  *    no match ⇒ allow (the default); an empty Disallow value is a
  *    no-op.
  *
  * Lenient on hostile input (comments, junk lines, unknown directives
  * skipped; never throws) — RobotsSpec fuzzes. No reference analog
  * (builder-brief extension); rules per the public RFC 9309. */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parse the rule set applying to `agent`: specific groups win over
    * the `*` group; a group is every User-agent run followed by its
    * rules (consecutive User-agent lines share one group). */
  def parse(content: String, agent: String): Seq[Rule] = {
    val la = agent.toLowerCase
    val specific = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val generic = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inAgents = false          // currently collecting User-agent lines
    var groupSpecific = false     // current group names our agent
    var groupGeneric = false      // current group names *
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) { groupSpecific = false; groupGeneric = false }
            inAgents = true
            val v = value.toLowerCase
            if (v == la) groupSpecific = true
            else if (v == "*") groupGeneric = true
          case "allow" | "disallow" =>
            inAgents = false
            if (value.nonEmpty) {
              val r = Rule(key == "allow", value)
              if (groupSpecific) specific += r
              else if (groupGeneric) generic += r
            }
          case _ => inAgents = false // unknown directive ends the header run
        }
      }
    }
    if (specific.nonEmpty) specific.toSeq else generic.toSeq
  }

  /** RFC 9309 pattern match against path(+query): prefix semantics,
    * `*` any-sequence, trailing `$` anchors the end. */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val segs = pat.split("\\*", -1)
    // first segment must match at the start (prefix rule)
    if (!path.startsWith(segs.head)) return false
    var pos = segs.head.length
    if (segs.length == 1) return !anchored || pos == path.length
    // middle segments: greedy leftmost walk (taking the leftmost
    // occurrence never loses a match — the rest of the pattern can
    // always match further right)
    for (seg <- segs.slice(1, segs.length - 1)) {
      if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
    }
    // the LAST segment is the only one whose placement the anchor
    // constrains: anchored means it must sit at the path's END (not at
    // its leftmost occurrence — '/*.php$' must match '/a.php.php')
    val last = segs.last
    if (last.isEmpty) true // trailing '*' absorbs anything (even under $)
    else if (anchored)
      path.endsWith(last) && path.length - last.length >= pos
    else path.indexOf(last, pos) >= 0
  }

  /** Decide (allowed, winning pattern) for a path under `rules`:
    * longest matching pattern wins, allow wins ties, default allow
    * (empty winning pattern). */
  def decide(rules: Seq[Rule], path: String): (Boolean, String) = {
    var best: Option[Rule] = None
    rules.foreach { r =>
      if (matches(r.pattern, path)) best match {
        case Some(b) =>
          if (r.pattern.length > b.pattern.length ||
              (r.pattern.length == b.pattern.length && r.allow && !b.allow))
            best = Some(r)
        case None => best = Some(r)
      }
    }
    best match {
      case Some(r) => (r.allow, r.pattern)
      case None => (true, "")
    }
  }

  /** The fixture robots.txt for site k — exercises wildcard, anchor,
    * longest-match precedence, and group selection in the oracle:
    * graftbot's group allows /doc/k* over the /doc/ disallow (6 > 5
    * octets), denies any query containing x= and exactly /privacy;
    * the * group (never selected for graftbot) denies everything. */
  def fixtureRobots(k: Long): String =
    s"""# robots for site$k.example.com
       |User-agent: graftbot
       |Allow: /doc/$k
       |Disallow: /doc/
       |Disallow: /*?x=
       |Disallow: /privacy$$
       |
       |User-agent: *
       |Disallow: /
       |""".stripMargin
}
