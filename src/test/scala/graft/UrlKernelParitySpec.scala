package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The canonicalize-url kernel's two contracts: (1) byte-identical to the
  * composed regexp-builtin formulation the DuckDB oracles restate
  * textually, across every fixture shape and a battery of adversarial
  * URLs; (2) small enough generated code that the URL-family plans stay
  * COMPILED — q_url_frontier's crawled-set filter, pushed through the
  * aggregate, duplicates the canonical tree and used to trip janino into
  * an interpreted fallback (collect with codegen.fallback=false proves the
  * whole plan compiles).
  */
class UrlKernelParitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Fixed-seed deterministic sampling (the SketchKernelPropertySpec
    * convention) — one copy serving both fuzz tests.
    */
  private def samples[A](g: org.scalacheck.Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("kernel output equals the builtin formulation on fixtures and adversarial URLs") {
    val adversarial = Seq(
      "HTTP://WWW.A.Example.COM:80/a/./b/../c%7Ed/?utm_source=f&id=7&ref=tw#sec",
      "https://CDN.x.example.com:443/img/x/../y/z.png?gclid=g&size=3px",
      "http://x.example.com/docs/2/index.html",
      "http://x.com", // no path
      "http://x.com#frag", // fragment, no path/query
      "http://x.com?b=2&a=1", // query, no path
      "http://x.com/?utm_a=1&utm_b=2", // tracking-only query
      "https://x.com/a/b/c/../../../d", // deep parent chain
      "http://x.com/../..", // leading dot-dots, nothing to pop
      "http://x.com/a/.././b/./", // mixed dot runs
      "http://x.com/%7Euser/%7e2/", // both tilde encodings
      "ftp://Files.X.com:21/pub/./a", // non-http scheme keeps its port
      "http://x.com/p#f?not=query", // '?' after '#': builtin still captures it
      "not a url at all",
      "/relative/path?utm_a=1",
      "//protocol.relative/x"
    ).toDF("url")
    val cmp = adversarial.select(
      col("url"),
      graft.functions.UrlFunctions.canonicalizeUrl(col("url")).as("kernel"),
      graft.functions.UrlFunctions.canonicalizeUrlBuiltins(col("url")).as("builtin")
    )
    val bad = cmp.filter(col("kernel") =!= col("builtin")).collect()
    assert(bad.isEmpty, s"kernel/builtin divergence:\n${bad.mkString("\n")}")

    // And across the real link-extraction fixture outputs: kernel/builtin
    // parity on every extracted URL, which (the urls being already
    // canonical) also proves canonicalization is idempotent.
    val links = TextQueries.extractedLinks(spark, sfDir)
    val fix = links.select(
      col("url"),
      graft.functions.UrlFunctions.canonicalizeUrl(col("url")).as("kernel"),
      graft.functions.UrlFunctions.canonicalizeUrlBuiltins(col("url")).as("builtin")
    )
    assert(
      fix.filter(col("kernel") =!= col("builtin") || col("kernel") =!= col("url")).isEmpty,
      "fixture divergence or non-idempotent canonicalization")
  }

  test("fuzzed kernel/builtin parity: 400 structured-random URLs agree byte for byte") {
    // Randomized URL components (mixed-case schemes/hosts, ports, dot
    // segments, tilde encodings, tracking and surviving params,
    // fragments) — the generator's support deliberately exceeds the
    // fixture battery, so a semantic gap between the kernel's
    // java.util.regex steps and the builtin tree surfaces here first.
    // Fixed seeds (the SketchKernelPropertySpec convention): failures
    // reproduce deterministically.
    import org.scalacheck.Gen
    val seg = Gen.oneOf("a", "B2", "x.y", "..z", ".", "..", "c%7Ed", "%7e", "idx9")
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp", "")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("x.com", "Ext.Example.ORG", "a-b.NET")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      nSegs <- Gen.choose(0, 5)
      segs <- Gen.listOfN(nSegs, seg)
      trailing <- Gen.oneOf("", "/")
      params <- Gen.someOf(Seq("utm_source=f", "ref=tw", "q=1", "gclid=g", "a=b", "mc_eid=x"))
      frag <- Gen.oneOf("", "#sec", "#a?b")
    } yield {
      val path = if (segs.isEmpty) trailing else segs.mkString("/", "/", trailing)
      val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
      if (scheme.isEmpty) s"$www$host$path$query$frag"
      else s"$scheme://$www$host$port$path$query$frag"
    }
    val urls = samples(urlGen, 400)
    val cmp = urls.toDF("url").select(
      col("url"),
      graft.functions.UrlFunctions.canonicalizeUrl(col("url")).as("kernel"),
      graft.functions.UrlFunctions.canonicalizeUrlBuiltins(col("url")).as("builtin")
    )
    val bad = cmp.filter(col("kernel") =!= col("builtin")).collect()
    assert(bad.isEmpty, s"kernel/builtin divergence on fuzzed URLs:\n${bad.take(10).mkString("\n")}")
  }

  test("resolveUrl∘canonicalizeUrl agrees with the JDK's RFC 3986 resolver on fuzzed pairs") {
    // java.net.URI.resolve is an INDEPENDENT RFC 3986 §5 implementation
    // (it resolves dot segments itself, where our pipeline defers them to
    // the canonicalizer) — canonicalizing BOTH results absorbs that split
    // of labor, so the comparison checks the end-to-end semantics against
    // a reference we didn't write. Fragment-only hrefs are excluded (URI
    // keeps the fragment, we return the base; the canonicalizer drops
    // fragments so they'd agree anyway, but the extractor filters them
    // before resolution — out of contract).
    import org.scalacheck.Gen
    val seg = Gen.oneOf("a", "b2", "x.y", "idx9", "..")
    val baseGen: Gen[String] = for {
      host <- Gen.oneOf("x.com", "ext.example.org")
      n <- Gen.choose(1, 4)
      segs <- Gen.listOfN(n, Gen.oneOf("a", "b2", "docs", "v1"))
      page <- Gen.oneOf("index.html", "p.html", "")
      q <- Gen.oneOf("", "?p=1")
    } yield s"http://$host${segs.mkString("/", "/", "/")}$page$q"
    val hrefGen: Gen[String] = for {
      kind <- Gen.choose(0, 4)
      segs <- Gen.listOfN(2, seg)
      q <- Gen.oneOf("", "?q=2", "?utm_source=f&k=1")
    } yield kind match {
      case 0 => s"https://other.net/${segs.mkString("/")}$q"
      case 1 => s"//cdn.net/${segs.mkString("/")}"
      case 2 => s"/${segs.mkString("/")}$q"
      case 3 => s"${segs.mkString("/")}.html$q"
      case _ => s"../${segs.mkString("/")}$q"
    }
    val pairs = samples(Gen.zip(baseGen, hrefGen), 300)
    // JDK resolution driver-side; both canonicalizations in ONE DF pass.
    val withJdk = pairs.map { case (b, h) => (b, h, new java.net.URI(b).resolve(h).toString) }
    val bad = withJdk
      .toDF("base", "href", "jdk")
      .select(
        col("base"),
        col("href"),
        col("jdk"),
        graft.functions.UrlFunctions
          .canonicalizeUrl(graft.functions.UrlFunctions.resolveUrl(col("base"), col("href")))
          .as("ours"),
        graft.functions.UrlFunctions.canonicalizeUrl(col("jdk")).as("jdk_canon"))
      .filter(col("ours") =!= col("jdk_canon"))
      .collect()
    assert(bad.isEmpty,
      s"divergence from java.net.URI on ${bad.length} pairs:\n${bad.take(10).mkString("\n")}")
  }

  test("the URL-family plans compile end to end (no interpreted fallback)") {
    // Restore the conf to its PRIOR state, not a hard-coded "true": the
    // shared SparkSpec session outlives this test, and clobbering a
    // session-level setting would silently change later suites' codegen
    // behavior (the EventsSchemaCanarySpec save/restore convention).
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      for (q <- Seq("q_url_canonical", "q_url_dedup", "q_link_extract", "q_url_frontier"))
        assert(QueryRegistry.queries(q)(spark, sfDir).collect().nonEmpty, s"$q returned no rows")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
