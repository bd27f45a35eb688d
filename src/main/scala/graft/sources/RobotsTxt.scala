package graft.sources

import java.util.Locale
import java.util.regex.Pattern

/** robots.txt parser + rule matcher (Robots Exclusion Protocol, RFC 9309 /
  * Google's robots.txt spec) — the real-format front end for the crawl
  * family's permission dimension. The reference's fetch layer
  * (alaska-etl utils.py:120-145 `requests.get` + BeautifulSoup) never
  * parses robots.txt; a production crawl pipeline hits it on day one, so
  * the engine carries the full grammar:
  *
  *   - line-oriented `key: value` records; `#` starts a comment; blank and
  *     malformed lines are ignored; CRLF and LF both accepted.
  *   - consecutive `User-agent:` lines form one group HEADER applying to
  *     all the named agents; the first rule line closes the header. A new
  *     `User-agent:` after rules starts the NEXT group.
  *   - `Allow:` / `Disallow:` attach to the current group; an EMPTY value
  *     is a no-op per the spec ("Disallow:" alone = no restriction). Rules
  *     before any User-agent line belong to no group and are dropped.
  *   - `Sitemap:` is a non-group record (does not open, close, or extend a
  *     group); other directives (Crawl-delay, ...) are group-scoped — they
  *     close a header but contribute no path rule.
  *
  * Group selection ([[rulesFor]]) follows Google's "most specific user
  * agent that still matches": a group matches when its (case-insensitive)
  * user-agent value is a PREFIX of the crawler's product token; among
  * matching groups the longest value wins, and all groups carrying exactly
  * that value merge (RFC 9309 duplicate-group merging). No match falls back
  * to the `*` groups; no `*` group means everything is allowed.
  *
  * Path patterns support the two spec wildcards: `*` matches any character
  * sequence and a TRAILING `$` anchors the pattern to the end of the path
  * (`$` anywhere else is a literal). [[patternRegex]] compiles a pattern to
  * the equivalent find()-semantics Java regex — the same string the
  * registered query ships in each rule struct so the per-candidate decision
  * stays row-local `regexp_like` inside codegen. Decision semantics
  * ([[bestMatch]]) are the standard longest-match-wins: the most specific
  * (longest, counting wildcards) matching pattern decides; Allow wins a
  * same-length tie; no matching rule means allowed — exactly the election
  * TextQueries.robotsBestMatch runs relationally, so the Scala and Spark
  * kernels are hand-case pinned against each other in RobotsTxtSpec.
  */
object RobotsTxt {

  /** One Allow/Disallow rule: the raw path pattern and its verdict. */
  final case class Rule(pattern: String, allow: Boolean)

  /** A rule group: the user-agent values it applies to, its rules, and its
    * Crawl-delay if one was declared (non-standard but near-universal — the
    * fetch-rate input q_politeness_parsed consumes).
    */
  final case class Group(
      agents: Seq[String],
      rules: Seq[Rule],
      crawlDelay: Option[Double] = None)

  /** [[Rule]] plus its compiled regex — the broadcastable row shape the
    * registered query carries (prefix = raw pattern so specificity =
    * length(prefix) matches the spec's pattern-length rule).
    */
  final case class ParsedRule(prefix: String, allow: Boolean, rx: String)

  /** Parse a robots.txt body into its rule groups, in file order. */
  def parseGroups(body: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay = Option.empty[Double]
    var started = false // a current group exists
    var inHeader = false // last group line was a User-agent line
    def flush(): Unit = {
      if (started) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None; started = false
    }
    body.split("\r?\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (line.nonEmpty && i > 0) {
        val key = line.substring(0, i).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (started && !inHeader) flush() // rules closed the previous group
            agents :+= value.toLowerCase(Locale.ROOT)
            started = true; inHeader = true
          case "allow" | "disallow" =>
            if (started) {
              inHeader = false
              if (value.nonEmpty) rules :+= Rule(value, key == "allow")
            }
          case "crawl-delay" =>
            if (started) {
              inHeader = false
              // First declaration wins within a group; unparseable values
              // are ignored (the directive is advisory and non-standard).
              if (delay.isEmpty) delay = value.toDoubleOption
            }
          case "sitemap" => () // non-group record: invisible to grouping
          case _ => if (started) inHeader = false // other group-scoped directives
        }
      }
    }
    flush()
    groups.result()
  }

  /** The groups governing `agent`: most-specific prefix match,
    * case-insensitive, with the `*` fallback — the shared selection behind
    * [[rulesFor]] and [[crawlDelayFor]].
    */
  def selectGroups(body: String, agent: String): Seq[Group] = {
    val tok = agent.toLowerCase(Locale.ROOT)
    val groups = parseGroups(body)
    def matchLen(g: Group): Int =
      g.agents.filter(ua => ua != "*" && tok.startsWith(ua)).map(_.length).foldLeft(-1)(_ max _)
    val best = groups.map(matchLen).foldLeft(-1)(_ max _)
    if (best >= 0) groups.filter(matchLen(_) == best)
    else groups.filter(_.agents.contains("*"))
  }

  /** Select and merge the rule groups governing `agent` (a crawler product
    * token): most-specific prefix match, case-insensitive, `*` fallback,
    * empty when no group applies (= everything allowed).
    */
  def rulesFor(body: String, agent: String): Seq[Rule] =
    selectGroups(body, agent).flatMap(_.rules)

  /** The Crawl-delay governing `agent` (first declaration among the
    * selected groups), None when the selected groups declare none.
    */
  def crawlDelayFor(body: String, agent: String): Option[Double] =
    selectGroups(body, agent).flatMap(_.crawlDelay).headOption

  /** Compile a robots path pattern to the equivalent Java regex under
    * find() semantics: `^` + literal chars (regex metachars escaped), `*`
    * as `.*`, a trailing `$` kept as the end anchor (elsewhere escaped).
    */
  def patternRegex(pattern: String): String = {
    val (core, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val sb = new StringBuilder("^")
    core.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()^$|?+".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  /** Parse + select + compile in one step — the per-host row the registered
    * query broadcasts.
    */
  def parsedRulesFor(body: String, agent: String): Seq[ParsedRule] =
    rulesFor(body, agent).map(r => ParsedRule(r.pattern, r.allow, patternRegex(r.pattern)))

  private def matches(rule: Rule, path: String): Boolean =
    Pattern.compile(patternRegex(rule.pattern)).matcher(path).find()

  /** Longest-match-wins election over `rules` for `path`: longest pattern
    * decides, Allow wins a same-length tie (then pattern string, making the
    * election total) — the Scala twin of TextQueries.robotsBestMatch's
    * array_max(struct(length, allow, prefix)).
    */
  def bestMatch(rules: Seq[Rule], path: String): Option[Rule] = {
    val m = rules.filter(matches(_, path))
    // Specificity and tiebreak measured the way the native kernel measures
    // them (r15 advice — the two kernels must agree beyond ASCII): length
    // in CODE POINTS (UTF8String.numChars counts code points, while
    // String.length counts UTF-16 units — a supplementary-plane character
    // is 1 vs 2) and the final tiebreak in code-point order (UTF-8 byte
    // order == code-point order, while String.compareTo's UTF-16-unit
    // order sorts surrogate pairs below U+E000..U+FFFF).
    def cpLen(s: String): Int = s.codePointCount(0, s.length)
    def cpCompare(a: String, b: String): Int = {
      val (ia, ib) = (a.codePoints().iterator(), b.codePoints().iterator())
      while (ia.hasNext && ib.hasNext) {
        val c = Integer.compare(ia.nextInt(), ib.nextInt())
        if (c != 0) return c
      }
      java.lang.Boolean.compare(ia.hasNext, ib.hasNext)
    }
    if (m.isEmpty) None
    else Some(m.reduceLeft { (a, b) =>
      val c = Integer.compare(cpLen(a.pattern), cpLen(b.pattern))
      val better =
        c < 0 || (c == 0 && (java.lang.Boolean.compare(a.allow, b.allow) match {
          case 0 => cpCompare(a.pattern, b.pattern) < 0
          case x => x < 0
        }))
      if (better) b else a
    })
  }

  /** The fetch verdict: the best-matching rule's polarity, allowed when no
    * rule matches.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean =
    bestMatch(rules, path).forall(_.allow)
}
