package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).as[T].head()

  test("tokenCount counts whitespace tokens") {
    assert(one[Int](tokenCount(col("text")), "the quick  brown\tfox") == 4)
  }

  test("regexTokenCount splits alpha runs, digits, punctuation") {
    // "ab12,c" -> [ab] [1] [2] [,] [c]
    assert(one[Int](regexTokenCount(col("text")), "ab12,c") == 5)
  }

  test("alphaRatio and punctRatio") {
    assert(one[Double](alphaRatio(col("text")), "ab.,") == 0.5)
    assert(one[Double](punctRatio(col("text")), "ab.,") == 0.5)
  }

  test("langId picks the dominant marker language, und when none") {
    assert(one[String](langId(col("text")), "the cat and the dog is here") == "en")
    assert(one[String](langId(col("text")), "der hund und die katze ist da") == "de")
    assert(one[String](langId(col("text")), "xyzzy plugh") == "und")
  }

  test("docFingerprint is deterministic and word-order sensitive") {
    val a = one[Long](docFingerprint(col("text")), "hello world foo")
    val b = one[Long](docFingerprint(col("text")), "hello world foo")
    val c = one[Long](docFingerprint(col("text")), "foo world hello")
    assert(a == b)
    assert(a != c)
    assert(a >= 0 && a < 1000000007L)
  }

  test("stopwordRatio on a half-stopword sentence") {
    assert(one[Double](stopwordRatio(col("text")), "the dog") == 0.5)
  }

  test("canonicalizeUrl: case, ports, www, dot segments, tracking params, fragment") {
    import graft.functions.UrlFunctions
    def canon(u: String): String = one[String](UrlFunctions.canonicalizeUrl(col("text")), u)
    // The full dirt spectrum in one URL.
    assert(canon("HTTP://WWW.Ex.COM:80/a/./b/../c%7Ed/?utm_source=f&id=7&ref=tw#sec")
      == "http://ex.com/a/c~d/?id=7")
    // Deep ../ nesting resolves (4 levels, well under the 8-pass bound).
    assert(canon("https://x.com/a/b/c/d/../../../../e") == "https://x.com/e")
    // Leading ../ with nothing to consume collapses to root.
    assert(canon("http://x.com/../../a") == "http://x.com/a")
    // Tracking-only query drops its '?'; non-default port survives.
    assert(canon("https://x.com:8443/p?utm_a=1&gclid=g") == "https://x.com:8443/p")
    // :443 stripped only for https, :80 only for http.
    assert(canon("https://x.com:443/p") == "https://x.com/p")
    assert(canon("http://x.com:443/p") == "http://x.com:443/p")
    // Empty path becomes '/', surviving params keep their order.
    assert(canon("http://x.com?b=2&a=1") == "http://x.com/?b=2&a=1")
    // Not an absolute URL: passes through untouched.
    assert(canon("not a url at all") == "not a url at all")
    assert(canon("/relative/path?utm_a=1") == "/relative/path?utm_a=1")
  }

  test("resolveUrl: every RFC 3986 reference-resolution case") {
    def res(base: String, href: String): String =
      Seq((base, href))
        .toDF("base", "href")
        .select(graft.functions.UrlFunctions.resolveUrl(col("base"), col("href")).as("r"))
        .as[String]
        .head()
    val base = "http://x.com/a/b/index.html?p=1#top"
    // Absolute passes through untouched (even a different scheme).
    assert(res(base, "https://y.org/z") == "https://y.org/z")
    // Protocol-relative takes the base's scheme.
    assert(res(base, "//cdn.y.org/l.js") == "http://cdn.y.org/l.js")
    // Root-relative takes the base's raw authority.
    assert(res(base, "/top") == "http://x.com/top")
    // Query-only keeps the base's path.
    assert(res(base, "?q=2") == "http://x.com/a/b/index.html?q=2")
    // Fragment-only resolves to the base minus its own fragment.
    assert(res(base, "#sec") == "http://x.com/a/b/index.html?p=1")
    // Relative splices onto the base's directory; dots are left for the
    // canonicalizer (the two compose).
    assert(res(base, "c.html") == "http://x.com/a/b/c.html")
    assert(res(base, "../up.html") == "http://x.com/a/b/../up.html")
    // A base with no path resolves relatives against '/'.
    assert(res("http://x.com", "p.html") == "http://x.com/p.html")
  }

  test("tokenIdStream: ordered ids, OOV->unk, empty doc keeps a row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "  "),
      (3L, "THE unknownword the")
    ).toDF("doc_id", "text")
    val vocab = Seq(("the", 1), ("cat", 2), ("mat", 3))
    val out = TextQueries
      .tokenIdStream(docs, col("text"), vocab)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)]
      .collect()
    // Order preserved, case-folded lookup, OOV -> 0.
    assert(out(0) == ((1L, 6L, 2L, "1,2,0,0,1,3")))
    // Whitespace-only doc keeps its row with an empty stream.
    assert(out(1) == ((2L, 0L, 0L, "")))
    assert(out(2) == ((3L, 3L, 1L, "1,0,1")))
  }

  test("tokenIdStream over bpeSegmentsTable: the BPE trainer input — symbol ids, zero OOV under a full symbol vocab") {
    import spark.implicits._
    // The segments column is space-joined symbols, so the whitespace
    // tokenization tokenIdStream applies recovers exactly the symbol
    // sequence — the id stream a trainer consumes. A vocab built over
    // ALL distinct symbols makes every symbol resolvable: n_tokens must
    // equal the kernel's own n_bpe_tokens and n_oov must be zero.
    val segs = TextQueries.bpeSegmentsTable(spark, sfDir).cache()
    val symVocab = segs
      .select(explode(split(col("segments"), " ")).as("sym"))
      .filter(length(col("sym")) > 0)
      .groupBy("sym")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("sym"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (r.getString(0), i + 1) }
      .toSeq
    val ids = TextQueries.tokenIdStream(segs, col("segments"), symVocab)
    val joined = ids
      .join(segs.select(col("doc_id"), col("n_bpe_tokens")), "doc_id")
      .select(
        (col("n_tokens") === col("n_bpe_tokens")).as("count_agree"),
        (col("n_oov") === 0L).as("no_oov"))
      .as[(Boolean, Boolean)]
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(_._1), "symbol-id stream length must equal the kernel token count")
    assert(joined.forall(_._2), "full symbol vocab must leave zero OOV")
    segs.unpersist()
  }
}
