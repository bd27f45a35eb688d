package graft.sources

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Incremental file discovery from a directory-listing document — the
  * reference's entry seam (uscrn_dag.py:115-132 get_new_file_urls: pandas
  * read_html over the NOAA updates page, drop Size/Description, parse
  * "Last modified", keep rows newer than the warehouse watermark, return
  * base + "/" + Name).
  *
  * Re-expressed as a pure function over pre-fetched listing text (fetching
  * is out of scope here exactly as in [[HtmlTable]]): parse the first
  * <table> of an Apache-style index page, find the Name / "Last modified"
  * columns by header, drop non-file rows (parent-directory link, divider
  * rows, blank timestamps — the reference's dropna), and keep names whose
  * modification time is strictly after the watermark. The watermark is
  * [[StagingSink.lastAdded]]'s audit max (reference check_last_added,
  * uscrn_dag.py:96-113), so discovery → [[FixedWidthText.read]] →
  * [[StagingSink]] closes the reference's incremental loop end-to-end.
  *
  * One listing page per run is a driver-side decision by nature (it GATES
  * the distributed read); the heavy lifting — reading the discovered
  * files — stays a distributed scan over the returned paths.
  */
object ListingDiscovery {

  private val tsFormats = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
  )

  private[sources] def parseModified(s: String): Option[LocalDateTime] =
    tsFormats.view.flatMap { f =>
      try Some(LocalDateTime.parse(s.trim, f))
      catch { case _: java.time.format.DateTimeParseException => None }
    }.headOption

  /** (name, lastModified) of every file row in the listing's first table. */
  private[sources] def entries(listingHtml: String): Seq[(String, LocalDateTime)] = {
    val rows = HtmlTable.extractTable(listingHtml, 0)
    val header = rows.find(_.exists(_.equalsIgnoreCase("Name")))
    header match {
      case None => Seq.empty
      case Some(h) =>
        val nameIdx = h.indexWhere(_.equalsIgnoreCase("Name"))
        val modIdx = h.indexWhere(_.equalsIgnoreCase("Last modified"))
        if (modIdx < 0) Seq.empty
        else
          rows.drop(rows.indexOf(h) + 1).flatMap { r =>
            for {
              name <- r.lift(nameIdx).map(_.trim)
              if name.nonEmpty && !name.equalsIgnoreCase("Parent Directory")
              ts <- r.lift(modIdx).flatMap(parseModified)
            } yield (name, ts)
          }
    }
  }

  /** The reference's get_new_file_urls END-TO-END (uscrn_dag.py:115-132):
    * fetch the listing page through the injected [[Fetcher]], parse it, and
    * return the watermark-filtered file urls. The default fetcher fails
    * loudly (zero egress here); a deployment injects an HTTP-backed one and
    * this becomes the live entry seam of the incremental pipeline.
    */
  def discover(
      listingUrl: String,
      lastAdded: Option[java.sql.Timestamp],
      fetcher: Fetcher = Fetcher.unavailable
  ): Seq[String] =
    newFilePaths(fetcher.fetch(listingUrl), lastAdded, listingUrl)

  /** File paths strictly newer than the watermark, in listing order.
    * `lastAdded = None` (first run — empty main table) admits everything.
    */
  def newFilePaths(
      listingHtml: String,
      lastAdded: Option[java.sql.Timestamp],
      baseUrl: String
  ): Seq[String] = {
    val cutoff = lastAdded.map(_.toLocalDateTime)
    val base = baseUrl.stripSuffix("/")
    entries(listingHtml).collect {
      case (name, ts) if cutoff.forall(ts.isAfter) => s"$base/$name"
    }
  }
}
