package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML table extraction over pre-fetched page text — the reference scrapes
  * NWS forecast pages and turns the 6th <table> into columnar data
  * (reference: airflow/dags/nws_dag.py:63-75 scrape task;
  * airflow/dags/utils/utils.py:180-209 extract_table_data and :213-232
  * transpose_as_dict). Fetching is out of scope (no network in a Spark
  * executor's job description either); pages arrive as ordinary string rows
  * — one document per row, e.g. from `spark.read.option("wholetext", true)
  * .text(dir)` or a (url, html) table — and the parse runs per-row on
  * executors, so a million cached pages parse as one embarrassingly
  * parallel stage with no shuffle.
  *
  * The parser is scraped-table-grade, not a general HTML parser: comments
  * are stripped, <table> nesting is tracked (document-order indexing, same
  * as BeautifulSoup's find_all), <tr>/<td>/<th>/<font> are matched by
  * scan, tags inside cells are dropped and common entities decoded. That is
  * exactly the subset the reference's pages exercise.
  */
object HtmlTable {

  private val comments = "(?s)<!--.*?-->".r

  /** Inner HTML of every <table> in document order of the OPENING tag,
    * nested tables included — find_all("table") semantics.
    */
  private[sources] def tables(html0: String): Seq[String] = {
    val html = comments.replaceAllIn(html0, "")
    val tag = "(?i)</?table\\b[^>]*>".r
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val open = scala.collection.mutable.Stack.empty[(Int, Int)] // (startPos, contentFrom)
    for (m <- tag.findAllMatchIn(html)) {
      if (m.matched.charAt(1) != '/') open.push((m.start, m.end))
      else if (open.nonEmpty) {
        val (s, from) = open.pop()
        found += ((s, html.substring(from, m.start)))
      }
    }
    found.sortBy(_._1).map(_._2).toSeq
  }

  private def spans(html: String, tag: String): Seq[String] =
    s"(?is)<(?:$tag)\\b[^>]*>(.*?)</(?:$tag)>".r.findAllMatchIn(html).map(_.group(1)).toSeq

  private val anyTag = "(?s)<[^>]+>".r
  private val entities = Map(
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&deg;" -> "°"
  )

  private[sources] def text(cellHtml: String): String = {
    var s = anyTag.replaceAllIn(cellHtml, "")
    entities.foreach { case (k, v) => s = s.replace(k, v) }
    s.trim
  }

  /** Cell texts of every row of the `tableIdx`-th table. `cellTag` selects
    * the text-bearing element — "font" for the reference's NWS pages
    * (utils.py:197), "td|th" for ordinary tables.
    */
  def extractTable(html: String, tableIdx: Int, cellTag: String = "td|th"): Seq[Seq[String]] = {
    val ts = tables(html)
    if (tableIdx >= ts.length) Seq.empty
    else spans(ts(tableIdx), "tr").map(tr => spans(tr, cellTag).map(text))
  }

  /** Landscape transpose (utils.py:213-232): each <tr> is a COLUMN — first
    * cell the name, remaining cells the values — and the 48 h forecast is
    * split into two halves whose repeated column names concatenate in
    * document order. Divider rows (the colspan <tr>s the reference filters
    * at utils.py:195) carry fewer than 2 cells and are skipped.
    */
  def parseLandscape(
      html: String,
      tableIdx: Int,
      cellTag: String = "font"
  ): Map[String, Seq[String]] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    for (row <- extractTable(html, tableIdx, cellTag) if row.length >= 2)
      m(row.head) = m.getOrElse(row.head, Seq.empty) ++ row.tail
    m.toMap
  }

  /** The page-level "Last Update:" provenance text (reference
    * utils.py:174-188 `get_last_update_nws`): the first <td> in document
    * order whose text contains "Last Update:", normalized exactly as the
    * reference does — strip the label, the space before am/pm, the AKST
    * token and commas — leaving the "%I:%M%p %b %d %Y" shape the reference
    * pushes through XComs (e.g. "2:07pm Jan 1 2024"). None when the page
    * has no such cell, so one malformed fetch can't kill a corpus parse.
    */
  private[sources] def lastUpdateText(html0: String): Option[String] = {
    val html = comments.replaceAllIn(html0, "")
    spans(html, "td").map(text).find(_.contains("Last Update:"))
      .map(_.replaceAll("Last Update: |\\s(?=pm|am)|AKST |,", ""))
  }

  private val lastUpdateUdf = udf { (html: String) =>
    if (html == null) null else lastUpdateText(html).orNull
  }

  /** `last_update_nws` as a Column over raw page HTML — the reference
    * stamps this on every extracted forecast row (utils.py:209-213 inserts
    * the column into both table halves); here the stamp is a per-row
    * projection callers attach alongside [[landscapeRecords]]' output, so
    * the extracted rows carry the same page-level provenance column.
    */
  def lastUpdateNws(htmlCol: Column): Column = lastUpdateUdf(htmlCol)

  private val landscapeUdf =
    udf { (html: String, idx: Int, cellTag: String) =>
      // A failed fetch (null page) yields zero records, not a task-killing
      // NPE — one bad row must not fail a million-page corpus.
      if (html == null) Map.empty[String, Seq[String]]
      else parseLandscape(html, idx, cellTag)
    }

  /** One output row per record of the landscape table in `htmlCol`, with one
    * string column per requested table column; original input columns ride
    * along. The parse is a per-row projection + generator — no shuffle; a
    * corpus of pages fans out across executors untouched.
    */
  def landscapeRecords(
      df: DataFrame,
      htmlCol: Column,
      tableIdx: Int,
      cols: Seq[String],
      cellTag: String = "font"
  ): DataFrame = {
    val passthrough = df.columns.map(col).toIndexedSeq
    val n = array_min(transform(map_values(col("__m")), v => size(v)))
    df.withColumn("__m", landscapeUdf(htmlCol, lit(tableIdx), lit(cellTag)))
      .withColumn("__i", explode(sequence(lit(1), n)))
      .select(passthrough ++ cols.map(c => element_at(element_at(col("__m"), c), col("__i")).as(c)): _*)
  }
}
