package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RobotsTxt
import graft.sources.RobotsTxt.Rule

/** Hand cases for the robots.txt parser (grammar + group selection), the
  * pattern compiler (`*` / `$` anchors), and Scala↔Spark kernel agreement
  * (RobotsTxt.bestMatch vs TextQueries.robotsBestMatchRx).
  */
class RobotsTxtSpec extends AnyFunSuite with SparkSpec {

  private val fixture =
    """# top comment
      |Sitemap: https://h.example.com/sitemap.xml
      |
      |Disallow: /orphan-rule-before-any-group
      |
      |User-agent: googlebot
      |Disallow: /g
      |
      |User-Agent: GraftBot
      |User-agent: otherbot
      |Crawl-delay: 2
      |Allow:
      |Disallow: /search   # trailing comment
      |Allow: /search/about
      |
      |User-agent: graftbot
      |Disallow: /dup-group
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("parseGroups: comments, blank lines, orphan rules, multi-UA headers, CRLF") {
    val gs = RobotsTxt.parseGroups(fixture.replace("\n", "\r\n"))
    assert(gs.map(_.agents) == Seq(
      Seq("googlebot"), Seq("graftbot", "otherbot"), Seq("graftbot"), Seq("*")))
    // The orphan rule before any User-agent line is dropped; the empty
    // Allow: contributes no rule; trailing comments are stripped.
    assert(gs(1).rules == Seq(Rule("/search", allow = false), Rule("/search/about", allow = true)))
    assert(gs(3).rules == Seq(Rule("/", allow = false)))
  }

  test("rulesFor: exact token match is case-insensitive and merges duplicate groups") {
    val rs = RobotsTxt.rulesFor(fixture, "GRAFTBOT")
    // Both graftbot groups merge (RFC 9309); googlebot's and *'s rules do not leak in.
    assert(rs == Seq(
      Rule("/search", allow = false),
      Rule("/search/about", allow = true),
      Rule("/dup-group", allow = false)))
  }

  test("rulesFor: most-specific prefix group wins, * fallback, empty when no groups") {
    val body =
      """User-agent: graftbot
        |Disallow: /short
        |User-agent: graftbot-news
        |Disallow: /specific
        |User-agent: *
        |Disallow: /all
        |""".stripMargin
    // graftbot-news matches both graftbot groups by prefix; the longer token wins.
    assert(RobotsTxt.rulesFor(body, "graftbot-news") == Seq(Rule("/specific", allow = false)))
    // graftbot does NOT start with graftbot-news — only the shorter group applies.
    assert(RobotsTxt.rulesFor(body, "graftbot") == Seq(Rule("/short", allow = false)))
    // Unknown token falls back to the * group.
    assert(RobotsTxt.rulesFor(body, "strangerbot") == Seq(Rule("/all", allow = false)))
    // No matching group and no * group: everything allowed.
    assert(RobotsTxt.rulesFor("User-agent: x\nDisallow: /x\n", "ybot").isEmpty)
  }

  test("crawlDelayFor: group-scoped, selection-aware, first wins, junk ignored") {
    // The fixture's graftbot group declares Crawl-delay: 2; the googlebot
    // and * groups declare none — a delay must not leak across groups.
    assert(RobotsTxt.crawlDelayFor(fixture, "graftbot").contains(2.0))
    assert(RobotsTxt.crawlDelayFor(fixture, "googlebot").isEmpty)
    assert(RobotsTxt.crawlDelayFor(fixture, "strangerbot").isEmpty)
    val body =
      """User-agent: a
        |Crawl-delay: soon   # unparseable — ignored, advisory directive
        |Disallow: /x
        |Crawl-delay: 2.5
        |Crawl-delay: 9
        |User-agent: *
        |Crawl-delay: 4
        |""".stripMargin
    // First PARSEABLE declaration wins within the group; fallback groups
    // supply theirs only when selection lands on them.
    assert(RobotsTxt.crawlDelayFor(body, "a").contains(2.5))
    assert(RobotsTxt.crawlDelayFor(body, "b").contains(4.0))
  }

  test("patternRegex: * spans segments, trailing $ anchors, metachars are literal") {
    def m(pattern: String, path: String): Boolean =
      java.util.regex.Pattern.compile(RobotsTxt.patternRegex(pattern)).matcher(path).find()
    assert(m("/lib/p*.html$", "/lib/p3.html"))
    assert(m("/lib/p*.html$", "/lib/p/deep/x.html")) // * crosses segments
    assert(!m("/lib/p*.html$", "/lib/p3.html.bak")) // $ rejects a longer path
    assert(!m("/lib/p*.html$", "/lib/q3.html"))
    assert(m("/*.js$", "/lib.js"))
    assert(!m("/*.js$", "/lib.json"))
    assert(m("/a.html", "/a.html?never")) // prefix semantics without $
    assert(!m("/a.html", "/axhtml")) // the dot is literal, not a wildcard
    assert(!m("/a$b", "/a")) // $ not at the end is a literal
    assert(m("/a$b", "/a$b/c"))
  }

  test("bestMatch election: longest wins counting wildcards, allow wins ties, none = allowed") {
    val rs = Seq(
      Rule("/lib", allow = false),
      Rule("/lib/p*.html$", allow = true),
      Rule("/*.js$", allow = true))
    assert(RobotsTxt.bestMatch(rs, "/lib/p3.html").contains(Rule("/lib/p*.html$", allow = true)))
    assert(RobotsTxt.bestMatch(rs, "/lib/q.txt").contains(Rule("/lib", allow = false)))
    assert(RobotsTxt.bestMatch(rs, "/lib.js").contains(Rule("/*.js$", allow = true)))
    assert(RobotsTxt.bestMatch(rs, "/other").isEmpty)
    assert(RobotsTxt.isAllowed(rs, "/other"))
    // Same-length tie: allow wins (the spec's least-restrictive rule).
    val tie = Seq(Rule("/x", allow = false), Rule("/x", allow = true))
    assert(RobotsTxt.bestMatch(tie, "/x/y").contains(Rule("/x", allow = true)))
  }

  test("Scala and Spark elections agree on every fixture rule set and path") {
    // The registered query decides with robotsBestMatchRx over the structs
    // parsedRulesFor emits; RobotsTxt.bestMatch is the Scala twin the hand
    // cases above pin. Drive BOTH over the same grid so they cannot drift.
    val rs = Seq(
      Rule("/search", allow = false),
      Rule("/lib", allow = false),
      Rule("/lib/p*.html$", allow = true),
      Rule("/docs/up", allow = false),
      Rule("/*.js$", allow = true))
    val paths = Seq(
      "/search", "/search?q=1", "/lib", "/lib.js", "/lib/p3.html",
      "/lib/p3.html.bak", "/docs/up/idx1.html", "/docs/3/sub/page2.html", "/")
    val parsed = rs.map(r => RobotsTxt.ParsedRule(r.pattern, r.allow, RobotsTxt.patternRegex(r.pattern)))
    val rulesCol = array(parsed.map(p =>
      struct(lit(p.prefix).as("prefix"), lit(p.allow).as("allow"), lit(p.rx).as("rx"))): _*)
    paths.foreach { path =>
      // Three kernels, one election: the Scala reference, the HOF column
      // form, and the native compiled expression the registered query runs.
      for ((kernel, label) <- Seq(
          (TextQueries.robotsBestMatchRx(rulesCol, lit(path)), "hof"),
          (graft.functions.TextFunctions.robotsMatch(rulesCol, lit(path)), "native"))) {
        val row = spark.range(1)
          .select(kernel.as("best"))
          .select(col("best.allow"), col("best.prefix"))
          .head()
        val got = if (row.isNullAt(0)) None else Some(Rule(row.getString(1), row.getBoolean(0)))
        assert(got == RobotsTxt.bestMatch(rs, path), s"$label kernel disagrees on $path")
      }
    }
  }

  test("the parsed-robots plan compiles end to end (no interpreted fallback)") {
    // RobotsMatch's nullable-struct doGenCode is the round's one hand-rolled
    // codegen template — prove the WHOLE q_robots_parse plan compiles (the
    // UrlKernelParitySpec device: a doGenCode defect would silently drop the
    // stage to interpreted eval and pass every value test at 100× the cost).
    // Save/restore the session conf (shared SparkSpec session).
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      for (q <- Seq("q_robots_parse", "q_politeness_parsed"))
        assert(QueryRegistry.queries(q)(spark, sfDir).collect().nonEmpty, s"$q returned no rows")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("elections agree beyond ASCII: code-point length and code-point tiebreak") {
    // r15 advice: the native kernel measures specificity in CODE POINTS
    // (UTF8String.numChars) and tie-breaks in UTF-8 byte order (== code
    // point order); the Scala twin must use the same measures, not
    // String.length / String.compareTo (UTF-16 units, where a
    // supplementary character counts 2 and sorts BELOW U+E000..U+FFFF).
    // Two adversarial rule sets where the measures disagree:
    // 1) length: "/*💡" is 3 code points (4 UTF-16 units) — it
    //    must TIE with the 3-code-point "/ab", letting allow win, not beat
    //    it on raw UTF-16 length.
    val bulb = "💡" // U+1F4A1, supplementary plane
    val lenSet = Seq(Rule(s"/*$bulb", allow = false), Rule("/ab", allow = true))
    // 2) tiebreak: same length, same polarity — U+1F4A1 must sort ABOVE
    //    U+F000 (code-point order), though its lead surrogate sorts below.
    val tieSet = Seq(Rule(s"/*$bulb", allow = true), Rule("/*\uF000", allow = true))
    val paths = Seq(s"/ab$bulb", s"/x$bulb\uF000", "/ab", "/zz")
    for (rs <- Seq(lenSet, tieSet)) {
      val parsed = rs.map(r =>
        RobotsTxt.ParsedRule(r.pattern, r.allow, RobotsTxt.patternRegex(r.pattern)))
      val rulesCol = array(parsed.map(p =>
        struct(lit(p.prefix).as("prefix"), lit(p.allow).as("allow"), lit(p.rx).as("rx"))): _*)
      paths.foreach { path =>
        val row = spark.range(1)
          .select(graft.functions.TextFunctions.robotsMatch(rulesCol, lit(path)).as("best"))
          .select(col("best.allow"), col("best.prefix"))
          .head()
        val got = if (row.isNullAt(0)) None else Some(Rule(row.getString(1), row.getBoolean(0)))
        assert(got == RobotsTxt.bestMatch(rs, path), s"kernels disagree on $path for $rs")
      }
    }
    // The hand expectations themselves (not just parity): tie → allow wins;
    // code-point tiebreak elects the bulb.
    assert(RobotsTxt.bestMatch(lenSet, s"/ab$bulb").contains(Rule("/ab", allow = true)))
    assert(RobotsTxt.bestMatch(tieSet, s"/x$bulb\uF000").contains(Rule(s"/*$bulb", allow = true)))
  }
}
