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
  * Scope: `<urlset>` documents (one `<url>` per entry; `<loc>` required,
  * `<lastmod>`/`<priority>`/`<changefreq>` optional — absent elements parse
  * to None and the sitemaps.org DEFAULT priority 0.5 is applied by the
  * consumer, not invented here). `<sitemapindex>` fan-out is a fetch-layer
  * concern (each child sitemap is just another document through this
  * parser).
  */
object SitemapXml {

  final case class Entry(
      loc: String,
      lastmod: Option[String],
      priority: Option[Double],
      changefreq: Option[String]
  )

  def parse(xml: String): Seq[Entry] = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder().parse(new InputSource(new StringReader(xml)))
    val urls = doc.getElementsByTagNameNS("*", "url")
    (0 until urls.getLength).flatMap { i =>
      val el = urls.item(i).asInstanceOf[Element]
      def child(tag: String): Option[String] = {
        val ns = el.getElementsByTagNameNS("*", tag)
        if (ns.getLength == 0) None
        else Option(ns.item(0).getTextContent).map(_.trim).filter(_.nonEmpty)
      }
      // A malformed <priority> degrades to None like an absent element
      // (r15 advice): this is untrusted crawl input, and one site's typo
      // must not kill the whole ingest map — the consumer's 0.5 default
      // applies, same as if the hint were missing.
      child("loc").map(loc =>
        Entry(loc, child("lastmod"), child("priority").flatMap(_.toDoubleOption), child("changefreq")))
    }
  }
}
