package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the ingest-hygiene step between fetch and
  * domain-capping (q_cap_per_source keys on a source/domain; a crawl
  * frontier that doesn't canonicalize counts `HTTP://WWW.X.COM/a/../b`
  * and `http://x.com/b` as different pages and over-crawls every site).
  *
  * Built ENTIRELY from codegen'd regexp/string builtins in the RE2∩Java
  * dialect (the q_redact_pii rule), so the exact same steps restate in
  * DuckDB SQL for the oracle and the whole pass stays inside
  * whole-stage codegen — one map over the URL column, zero shuffles at
  * any corpus size.
  *
  * Canonical form (documented contract, applied in this order):
  *   1. fragment dropped (never reaches the server);
  *   2. scheme and authority lowercased; a leading `www.` stripped;
  *      default ports dropped (`:80` for http, `:443` for https);
  *   3. path: `%7E`/`%7e` decoded to `~` (the one unreserved octet that
  *      commonly appears encoded), `/./` runs collapsed, `..` segments
  *      resolved up to [[DotDotPasses]] levels of nesting (RFC 3986
  *      remove_dot_segments is a loop; eight fixed passes cover any URL
  *      a crawler meets — deeper chains would need a native kernel);
  *      empty path becomes `/`;
  *   4. query: tracking parameters removed (`utm_*`, `ref`, `fbclid`,
  *      `gclid`, `mc_eid`), surviving parameters kept IN ORDER (order-
  *      preserving canonicalization — sorting would need an explode or
  *      a native kernel for no dedup gain on real-world URLs, which are
  *      emitted param-stable); an emptied query drops its `?`;
  *   5. anything without a `scheme://` prefix passes through unchanged
  *      (relative references are not canonicalized, they're resolved —
  *      a different operation needing a base URL).
  */
object UrlFunctions {

  /** Fixed pass count for `..` resolution — bounds regex application
    * while covering any realistic nesting depth.
    */
  val DotDotPasses = 8

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme, or '' when the value is not an absolute URL. */
  def urlScheme(u: Column): Column = lower(regexp_extract(u, schemeRe, 1))

  /** Canonical host[:port]: authority lowercased, leading `www.`
    * stripped, default port for the scheme dropped. The domain key
    * cap_per_source / PageRank-style frontier logic groups on.
    */
  def urlHost(u: Column): Column = {
    val auth = lower(regexp_extract(u, schemeRe + "([^/?#]*)", 2))
    val noWww = regexp_replace(auth, "^www\\.", "")
    when(urlScheme(u) === "http", regexp_replace(noWww, ":80$", ""))
      .when(urlScheme(u) === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** Canonical path: %7E decoded, dot segments resolved, '' → '/'. */
  private[graft] def canonicalPath(u: Column): Column = {
    val raw = regexp_extract(u, schemeRe + "[^/?#]*([^?#]*)", 2)
    val nonEmpty = when(raw === "", lit("/")).otherwise(raw)
    val decoded = regexp_replace(nonEmpty, "%7[Ee]", "~")
    // '/./' runs collapse in one pass with a quantified group; a bare
    // trailing '/.' normalizes to '/'.
    val noDot = regexp_replace(regexp_replace(decoded, "/(\\./)+", "/"), "/\\.$", "/")
    // Each pass removes one level of '/segment/../' nesting (leftmost,
    // non-overlapping), plus a trailing '/segment/..' and any leading
    // '/../' left with nothing to consume. The segment alternation
    // excludes the literal '.' and '..' segments WITHOUT lookahead (RE2
    // has none): a bare [^/]+ would match '..' itself and let
    // '/../../' self-annihilate instead of popping real segments.
    val seg = "([^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"
    (1 to DotDotPasses).foldLeft(noDot) { (p, _) =>
      regexp_replace(
        regexp_replace(regexp_replace(p, s"/$seg/\\.\\./", "/"), s"/$seg/\\.\\.$$", "/"),
        "^(/\\.\\.)+/",
        "/")
    }
  }

  /** Canonical query string (no leading '?'): tracking params removed,
    * survivors kept in order; '' when nothing survives.
    */
  private[graft] def canonicalQuery(u: Column): Column = {
    val q = regexp_extract(u, "\\?([^#]*)", 1)
    val stripped =
      regexp_replace(concat(lit("&"), q), "&(utm_[^=&]*|ref|fbclid|gclid|mc_eid)=[^&]*", "")
    regexp_replace(stripped, "^&+", "")
  }

  /** Resolve an href against its page's base URL (RFC 3986 §5 reference
    * resolution, the subset a crawler meets) — the step between link
    * extraction and canonicalization. Same implementation rule as the
    * canonicalizer: pure codegen'd string/regexp builtins, one map pass,
    * zero shuffles. Cases, in documented order:
    *   - absolute (`scheme://…`): kept as-is;
    *   - protocol-relative (`//host/p`): base's scheme attached;
    *   - root-relative (`/p`): base's raw authority attached;
    *   - query-only (`?q=1`): replaces the base's query, keeps its path;
    *   - fragment-only (`#x`): resolves to the base itself minus its own
    *     fragment (a same-document reference — frontier callers filter
    *     these before resolution);
    *   - relative path (`p`, `../p`): spliced onto the base's directory
    *     (path up to the last '/'); the resulting `..`/`.` segments are
    *     NOT resolved here — that is [[canonicalizeUrl]]'s job, so the
    *     two compose without duplicating the dot-segment logic.
    * The base's authority is used RAW (not canonicalized): resolution and
    * canonicalization stay orthogonal, `canonicalizeUrl(resolveUrl(b, h))`
    * is the full pipeline.
    */
  def resolveUrl(base: Column, href: Column): Column = {
    val scheme = urlScheme(base)
    val auth = regexp_extract(base, schemeRe + "([^/?#]*)", 2)
    val rawPath = regexp_extract(base, schemeRe + "[^/?#]*([^?#]*)", 2)
    val basePath = when(rawPath === "", lit("/")).otherwise(rawPath)
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    val origin = concat(scheme, lit("://"), auth)
    when(href.rlike(schemeRe), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(origin, href))
      .when(href.startsWith("?"), concat(origin, basePath, href))
      .when(href.startsWith("#"), concat(origin, basePath, regexp_extract(base, "(\\?[^#]*)", 1)))
      .otherwise(concat(origin, baseDir, href))
  }

  /** The full canonical URL (see object doc for the contract), as ONE
    * native kernel call ([[graft.functions.CanonicalizeUrl]]): the
    * composed-builtin formulation below generates ~40 nested regexp nodes,
    * and optimizer substitutions that duplicate it (predicate pushdown
    * through a groupBy's canonical-url grouping alias) pushed generated
    * stages past janino's compile limits — the kernel applies the SAME
    * java.util.regex steps in one static invoke, byte-identical output.
    */
  def canonicalizeUrl(u: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(CanonicalizeUrl(toExpr(u)))
  }

  /** The composed-builtin formulation of [[canonicalizeUrl]] — kept as the
    * executable cross-check that the kernel and the regexp-builtin steps
    * (which the DuckDB oracles restate textually) agree byte for byte
    * (UrlKernelParitySpec asserts equality on the fixture corpus).
    */
  private[graft] def canonicalizeUrlBuiltins(u: Column): Column = {
    val scheme = urlScheme(u)
    val query = canonicalQuery(u)
    val canon = concat(
      scheme,
      lit("://"),
      urlHost(u),
      canonicalPath(u),
      when(query === "", lit("")).otherwise(concat(lit("?"), query))
    )
    when(scheme === "", u).otherwise(canon)
  }
}
