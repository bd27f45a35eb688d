package graft.sources

/** The reference's transport half (utils.py:14-42: `get_soup` =
  * requests.get + parse, `check_connection` = probe-with-timeout) as an
  * injection seam. The engine keeps its parsers ([[HtmlTable]],
  * [[ListingDiscovery]]) pure functions over already-fetched text — that is
  * what lets a million cached pages parse as a distributed scan — while a
  * deployment injects a real HTTP fetcher here and runs the same listing →
  * parse → staging pipeline live. This sandbox has zero egress, so the
  * default implementation fails loudly instead of fabricating data.
  */
trait Fetcher {

  /** Return the document body at `url` (the transport half of the
    * reference's get_soup). Throws on failure — [[graft.pipeline.Pipeline]]
    * step retries are the retry policy, exactly like the reference's
    * Airflow default_args retries around its fetching tasks.
    */
  def fetch(url: String): String

  /** Health probe (reference check_connection, utils.py:27-42):
    * `Left(reason)` on failure, for [[graft.pipeline.Pipeline.preflight]]'s
    * alert-and-skip semantics. Defaults to probing via [[fetch]]; an HTTP
    * implementation overrides with a HEAD request.
    */
  def checkConnection(url: String): Either[String, Unit] =
    try { fetch(url); Right(()) }
    catch { case scala.util.control.NonFatal(e) => Left(s"$url unreachable: $e") }
}

object Fetcher {

  /** Environment default: no network egress here, so fetching fails loudly
    * (and [[Fetcher.checkConnection]] turns that into a preflight skip — the
    * run does nothing rather than doing the wrong thing).
    */
  val unavailable: Fetcher = new Fetcher {
    def fetch(url: String): String =
      throw new UnsupportedOperationException(
        s"no network egress in this environment — inject a Fetcher to fetch $url")
    override def checkConnection(url: String): Either[String, Unit] =
      Left(s"no network egress in this environment: $url")
  }

  /** Lift a plain `url => body` function (a test fake, a page cache, an
    * HTTP client adapter) into the seam.
    */
  def apply(f: String => String): Fetcher = new Fetcher {
    def fetch(url: String): String = f(url)
  }
}
