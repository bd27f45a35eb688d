package graft.sources

import java.io.StringReader

import org.w3c.dom.Element
import org.xml.sax.InputSource

/** sitemap.xml parser (sitemaps.org protocol) — the crawl family's
  * DISCOVERY input, completing the trio the way RobotsTxt completes
  * permission: robots.txt says what MAY be fetched, the frontier says what
  * the link graph wants fetched, the sitemap says what the site itself
  * advertises (with its own priority/lastmod hints). Real format through a
  * real parser: the JDK DOM parser, namespace-aware (the protocol requires
  * `xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"` on `<urlset>`),
  * entity-unescaping (a `<loc>` holding `?q=1&amp;x=2` must come back with
  * a literal `&`), with DOCTYPE declarations REJECTED — sitemap bodies are
  * untrusted crawl input and inline DTDs are the classic XXE/billion-laughs
  * vector, so the parser fails closed on them.
  *
  * Scope: both protocol document kinds through the same hardened parser —
  * `<urlset>` (one `<url>` per entry; `<loc>` required,
  * `<lastmod>`/`<priority>`/`<changefreq>` optional — absent elements parse
  * to None and the sitemaps.org DEFAULT priority 0.5 is applied by the
  * consumer, not invented here) via [[parse]], and `<sitemapindex>` (one
  * `<sitemap>` per child document; `<loc>` required, `<lastmod>` optional)
  * via [[parseIndex]] — large sites ship an index on day one, and each
  * advertised child is just another urlset document back through [[parse]].
  * Each method reads only its own document kind: [[parse]] of an index (or
  * [[parseIndex]] of a urlset) yields an empty table, so a mis-routed
  * document surfaces as a discovery gap, never as phantom entries.
  */
object SitemapXml {

  final case class Entry(
      loc: String,
      lastmod: Option[String],
      priority: Option[Double],
      changefreq: Option[String]
  )

  /** One child-sitemap reference inside a `<sitemapindex>`. */
  final case class IndexEntry(loc: String, lastmod: Option[String])

  /** Parse with the untrusted-input hardening shared by both document
    * kinds: namespace-aware, DOCTYPE rejected (XXE/billion-laughs), no
    * XInclude, no entity expansion beyond the five predefined ones.
    *
    * The hardened builder is constructed ONCE per thread (r17:
    * DocumentBuilderFactory.newInstance is an SPI lookup per call — pure
    * per-row overhead on the executor hot path) and reset() before each
    * parse, which restores it to its freshly-constructed state: identical
    * parsing behavior, the factory cost amortized over the partition. The
    * hardening features are factory-level and survive reset().
    */
  private val secureBuilder = new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
    override def initialValue(): javax.xml.parsers.DocumentBuilder = {
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setXIncludeAware(false)
      dbf.setExpandEntityReferences(false)
      dbf.newDocumentBuilder()
    }
  }

  private def parseSecure(xml: String): org.w3c.dom.Document = {
    val b = secureBuilder.get()
    b.reset()
    b.parse(new InputSource(new StringReader(xml)))
  }

  private def childText(el: Element, tag: String): Option[String] = {
    val ns = el.getElementsByTagNameNS("*", tag)
    if (ns.getLength == 0) None
    else Option(ns.item(0).getTextContent).map(_.trim).filter(_.nonEmpty)
  }

  def parse(xml: String): Seq[Entry] = {
    val urls = parseSecure(xml).getElementsByTagNameNS("*", "url")
    (0 until urls.getLength).flatMap { i =>
      val el = urls.item(i).asInstanceOf[Element]
      // A malformed <priority> degrades to None like an absent element
      // (r15 advice): this is untrusted crawl input, and one site's typo
      // must not kill the whole ingest map — the consumer's 0.5 default
      // applies, same as if the hint were missing.
      childText(el, "loc").map(loc =>
        Entry(
          loc,
          childText(el, "lastmod"),
          childText(el, "priority").flatMap(_.toDoubleOption),
          childText(el, "changefreq")))
    }
  }

  /** The `<sitemapindex>` table: advertised child sitemaps, in document
    * order. Loc-less `<sitemap>` elements are dropped like loc-less urls.
    */
  def parseIndex(xml: String): Seq[IndexEntry] = {
    val sms = parseSecure(xml).getElementsByTagNameNS("*", "sitemap")
    (0 until sms.getLength).flatMap { i =>
      val el = sms.item(i).asInstanceOf[Element]
      childText(el, "loc").map(loc => IndexEntry(loc, childText(el, "lastmod")))
    }
  }
}
