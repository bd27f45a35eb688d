package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — boilerplate/chrome removal, the step a
  * web corpus needs BEFORE any text-quality gate (every quality operator
  * downstream assumes clean prose; nav bars, footers and link farms
  * otherwise dominate token counts and poison dedup shingles).
  * [[HtmlTable]]'s sibling: that one scrapes STRUCTURED tables out of
  * known pages (the reference's NWS use), this one recovers the prose
  * body of ARBITRARY pages.
  *
  * The classifier is the simplified jusText/Boilerpipe text-density
  * rule, deliberately deterministic and dependency-free:
  *   1. comments, <script>/<style>/<noscript> payloads, and the whole
  *      <head> are dropped;
  *   2. the remainder segments into blocks at block-level tags (div, p,
  *      headings, lists, tables, section/article/header/footer/nav,
  *      br/hr, …) — inline tags (<a>, <b>, <em>, <span>, …) do NOT
  *      split a block;
  *   3. each block's visible text is tag-stripped, entity-decoded and
  *      trimmed ([[HtmlTable.text]] — one decode contract for both
  *      extractors); empty blocks vanish;
  *   4. a block is CONTENT iff its text is ≥ [[MinContentChars]] chars
  *      AND its link density (visible chars inside <a> spans ÷ total
  *      visible chars) is ≤ [[MaxLinkDensity]] — short chrome fails the
  *      first cut, link farms ("related articles") the second.
  *
  * Like the table parser this runs per row on executors — a million
  * cached pages extract as one embarrassingly parallel map stage, no
  * shuffle (plan-pinned by the registered query).
  */
object HtmlContent {

  val MinContentChars = 30
  val MaxLinkDensity = 0.33

  private val comments = "(?s)<!--.*?-->".r
  private val dropPayload =
    Seq("script", "style", "noscript", "head").map(t => s"(?is)<$t\\b[^>]*>.*?</$t>".r)
  private val blockTags =
    ("(?i)</?(?:div|p|h[1-6]|table|thead|tbody|tfoot|tr|td|th|ul|ol|li|dl|dt|dd|blockquote|pre" +
      "|section|article|header|footer|nav|aside|main|form|fieldset|figure|figcaption|br|hr)\\b[^>]*>").r
  private val anchorSpan = "(?is)<a\\b[^>]*>(.*?)</a>".r

  /** One segmented block: visible text, its link density, and the
    * content/boilerplate verdict.
    */
  final case class Block(text: String, linkDensity: Double, isContent: Boolean)

  /** Segment a page into classified blocks (document order, empties
    * dropped). Null-safe at the caller ([[extractUdf]]).
    */
  def blocks(html0: String): Seq[Block] = {
    val noComments = comments.replaceAllIn(html0, "")
    val stripped = dropPayload.foldLeft(noComments)((h, re) => re.replaceAllIn(h, " "))
    blockTags.split(stripped).toSeq.flatMap { raw =>
      val visible = HtmlTable.text(raw)
      if (visible.isEmpty) None
      else {
        val linkChars = anchorSpan.findAllMatchIn(raw).map(m => HtmlTable.text(m.group(1)).length).sum
        val density = linkChars.toDouble / math.max(visible.length, 1)
        Some(Block(visible, density, visible.length >= MinContentChars && density <= MaxLinkDensity))
      }
    }
  }

  /** The page's main content: content blocks joined with '\n'. */
  def mainContent(html: String): String =
    blocks(html).filter(_.isContent).map(_.text).mkString("\n")

  private val extractUdf = udf { (html: String) =>
    // A failed fetch (null page) yields the empty extraction, not a
    // task-killing NPE — one bad row must not fail a million-page corpus.
    if (html == null) (Seq.empty[String], 0, 0)
    else {
      val bs = blocks(html)
      (bs.filter(_.isContent).map(_.text), bs.length, bs.count(_.isContent))
    }
  }

  /** Per-row main-content projection: appends `content` (content blocks
    * joined '\n'), `n_blocks`, `n_content_blocks` to `df`. A map-only
    * plan — the corpus never shuffles for the extraction.
    */
  def extractMain(df: DataFrame, htmlCol: Column): DataFrame =
    df.withColumn("__x", extractUdf(htmlCol))
      .withColumn("content", array_join(col("__x._1"), "\n"))
      .withColumn("n_blocks", col("__x._2"))
      .withColumn("n_content_blocks", col("__x._3"))
      .drop("__x")
}
