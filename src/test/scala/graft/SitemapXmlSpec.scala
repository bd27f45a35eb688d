package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SitemapXml
import graft.sources.SitemapXml.Entry

/** Hand cases for the sitemap.xml parser: protocol namespace, optional
  * elements, entity unescaping, malformed-entry handling, and the
  * untrusted-input DOCTYPE rejection.
  */
class SitemapXmlSpec extends AnyFunSuite {

  private val fixture =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<!-- comment before the root -->
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>http://h.example.com/a.html</loc>
      |    <lastmod>2024-01-03</lastmod>
      |    <priority>0.8</priority>
      |    <changefreq>weekly</changefreq>
      |  </url>
      |  <url>
      |    <loc> http://h.example.com/search?q=1&amp;x=2 </loc>
      |  </url>
      |  <url>
      |    <lastmod>2024-01-04</lastmod>
      |  </url>
      |  <url>
      |    <loc>http://h.example.com/c.html</loc>
      |    <priority>0.5</priority>
      |  </url>
      |</urlset>
      |""".stripMargin

  test("parse: namespace root, optional elements to None, entity unescape, loc trim") {
    val es = SitemapXml.parse(fixture)
    assert(es == Seq(
      Entry("http://h.example.com/a.html", Some("2024-01-03"), Some(0.8), Some("weekly")),
      // Entity &amp; must come back literal; surrounding whitespace trims.
      Entry("http://h.example.com/search?q=1&x=2", None, None, None),
      // The loc-less entry is DROPPED (not an empty-loc row); c keeps only
      // what it declares.
      Entry("http://h.example.com/c.html", None, Some(0.5), None)))
  }

  test("parse: a sitemapindex document yields no url entries (fetch-layer fan-out)") {
    val idx =
      """<?xml version="1.0"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>http://h.example.com/sitemap1.xml</loc></sitemap>
        |</sitemapindex>
        |""".stripMargin
    assert(SitemapXml.parse(idx).isEmpty)
  }

  test("parse: DOCTYPE declarations are rejected (untrusted crawl input — XXE hardening)") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE urlset [<!ENTITY x SYSTEM "file:///etc/hostname">]>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://h.example.com/&x;</loc></url>
        |</urlset>
        |""".stripMargin
    intercept[org.xml.sax.SAXParseException](SitemapXml.parse(evil))
  }

  test("parse: malformed XML fails loudly rather than returning a partial table") {
    intercept[org.xml.sax.SAXParseException](SitemapXml.parse("<urlset><url><loc>x</loc>"))
  }

  test("parseIndex: child locs + optional lastmod; loc-less dropped; empty index = empty table") {
    val idx =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap>
        |    <loc>http://h.example.com/sitemap-0.xml</loc>
        |    <lastmod>2024-02-01</lastmod>
        |  </sitemap>
        |  <sitemap><loc> http://h.example.com/sitemap-1.xml </loc></sitemap>
        |  <sitemap><lastmod>2024-02-03</lastmod></sitemap>
        |</sitemapindex>
        |""".stripMargin
    assert(SitemapXml.parseIndex(idx) == Seq(
      SitemapXml.IndexEntry("http://h.example.com/sitemap-0.xml", Some("2024-02-01")),
      SitemapXml.IndexEntry("http://h.example.com/sitemap-1.xml", None)))
    assert(SitemapXml.parseIndex(
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"/>""").isEmpty)
    // Kind isolation both ways: an index yields no url entries (pinned
    // above) and a urlset yields no child sitemaps — a mis-routed document
    // is a discovery gap, never phantom rows.
    assert(SitemapXml.parseIndex(fixture).isEmpty)
  }

  test("parseIndex: DOCTYPE rejection covers the index grammar too") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE sitemapindex [<!ENTITY x SYSTEM "file:///etc/hostname">]>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>http://h.example.com/&x;</loc></sitemap>
        |</sitemapindex>
        |""".stripMargin
    intercept[org.xml.sax.SAXParseException](SitemapXml.parseIndex(evil))
  }

  test("parse: a malformed optional <priority> degrades to None, not an ingest failure") {
    // Untrusted crawl input: a typo'd optional HINT must degrade like an
    // absent element (the consumer's 0.5 default applies) — only malformed
    // XML structure fails loudly.
    val bad =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://h.example.com/a.html</loc><priority>high</priority></url>
        |  <url><loc>http://h.example.com/b.html</loc><priority>0.7</priority></url>
        |</urlset>
        |""".stripMargin
    assert(SitemapXml.parse(bad) == Seq(
      Entry("http://h.example.com/a.html", None, None, None),
      Entry("http://h.example.com/b.html", None, Some(0.7), None)))
  }
}
