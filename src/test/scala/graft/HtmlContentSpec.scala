package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HtmlContent, HtmlTable}

/** Gates for the main-content extractor (HtmlContent / q_html_extract):
  * block classification on synthetic markup, behavior on the REAL NWS
  * fixture pages, and non-interference with the table pipeline that
  * scrapes those same pages.
  */
class HtmlContentSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/nws/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("blocks: script/style/head dropped, inline tags keep a block whole, entities decode") {
    val html =
      """<html><head><title>T</title><style>p { x: 1 }</style></head><body>
        |<script>var boilerplate = "should never surface";</script>
        |<p>A paragraph with <b>inline</b> markup &amp; an entity, long enough to clear the bar.</p>
        |<div><a href="/x">Pure link farm block that is long enough to pass the length cut</a></div>
        |<p>tiny</p>
        |</body></html>""".stripMargin
    val bs = HtmlContent.blocks(html)
    assert(!bs.exists(_.text.contains("should never surface")), "script payload leaked")
    assert(!bs.exists(_.text.contains("x: 1")), "style payload leaked")
    assert(!bs.exists(_.text.contains("T")), s"head/title leaked: $bs")
    val content = bs.filter(_.isContent).map(_.text)
    assert(content == Seq("A paragraph with inline markup & an entity, long enough to clear the bar."))
    // The link farm fails ONLY the density cut; tiny fails only length.
    val farm = bs.find(_.text.startsWith("Pure link farm")).get
    assert(farm.text.length >= HtmlContent.MinContentChars && farm.linkDensity > HtmlContent.MaxLinkDensity)
    val tiny = bs.find(_.text == "tiny").get
    assert(tiny.linkDensity == 0.0 && !tiny.isContent)
  }

  test("dot and double-dot segments never split: nested divs segment in document order") {
    val bs = HtmlContent.blocks(
      "<div>first block is comfortably longer than the thirty character bar" +
        "<div>second nested block also clears the thirty character bar easily</div></div>")
    assert(bs.map(_.isContent) == Seq(true, true))
    assert(bs.head.text.startsWith("first block"))
    assert(bs(1).text.startsWith("second nested"))
  }

  test("NWS fixture pages: extraction runs, chrome is rejected, and the table pipeline is unaffected") {
    for (page <- Seq("anc.html", "fai.html")) {
      val html = fixture(page)
      val bs = HtmlContent.blocks(html)
      assert(bs.nonEmpty, s"$page produced no blocks")
      // The nav link rows at the top of every NWS page are link-dense
      // chrome — none of them may classify as content.
      val linkFarms = bs.filter(b => b.linkDensity > 0.9 && b.text.length >= HtmlContent.MinContentChars)
      assert(linkFarms.forall(!_.isContent), s"$page: link-farm chrome classified as content")
      // Non-interference: the landscape table scrape returns the same
      // records whether or not the content extractor also ran this page.
      val before = HtmlTable.parseLandscape(html, 2, cellTag = "font")
      HtmlContent.mainContent(html)
      val after = HtmlTable.parseLandscape(html, 2, cellTag = "font")
      assert(before == after && before.nonEmpty, s"$page: table scrape changed or empty")
    }
  }

  test("extractMain: null page yields the empty extraction, not a task failure") {
    val df = Seq((1L, "<p>A real paragraph long enough to count as content here.</p>"), (2L, null))
      .toDF("doc_id", "html")
    val out = HtmlContent.extractMain(df, col("html"))
      .select("doc_id", "content", "n_blocks", "n_content_blocks")
      .as[(Long, String, Int, Int)]
      .collect()
      .sortBy(_._1)
    assert(out(0) == ((1L, "A real paragraph long enough to count as content here.", 1, 1)))
    assert(out(1) == ((2L, "", 0, 0)))
  }

  test("q_html_extract: registered fixture page extracts exactly the oracle's ground truth") {
    val out = QueryRegistry.queries("q_html_extract")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.count() == docs)
    // Every row keeps the static paragraph (entity decoded) and never
    // leaks chrome into the content column.
    val rows = out.select("content").as[String].collect()
    assert(rows.forall(_.contains("Figures include bold and italic runs & entities")))
    assert(rows.forall(c => !c.contains("Home | About") && !c.contains("Example") && !c.contains("newsletter")))
  }
}
