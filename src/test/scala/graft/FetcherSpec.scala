package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.{Pipeline, RunStatus}
import graft.sources.{Fetcher, FixedWidthText, ListingDiscovery, StagingSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Drives a fake fetcher through the live entry seam end-to-end: preflight
  * (check_connection) → listing fetch+parse (get_new_file_urls) →
  * distributed file read → staging → keyed merge — the full reference DAG
  * shape (uscrn_dag.py) with only the transport faked.
  */
class FetcherSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("station_id", LongType),
    StructField("temp_c", DoubleType)
  ))

  private def listingHtml(rows: Seq[(String, String)]): String = {
    val body = rows
      .map { case (n, ts) => s"<tr><td><a href='$n'>$n</a></td><td>$ts</td><td>1K</td></tr>" }
      .mkString("\n")
    s"""<html><body><table>
       |<tr><th>Name</th><th>Last modified</th><th>Size</th></tr>
       |<tr><td><a href='/'>Parent Directory</a></td><td></td><td>-</td></tr>
       |$body
       |</table></body></html>""".stripMargin
  }

  test("unavailable fetcher: preflight alerts and skips, main stays untouched") {
    val run = Pipeline("fetch_preflight")
      .preflight("check_domain")(Fetcher.unavailable.checkConnection("https://example.invalid/data/"))
      .step("never_runs")(fail("step must not run after a failed preflight"))
      .run()
    assert(run.status.isInstanceOf[RunStatus.PreflightSkipped])
    assert(run.alerts.exists(_.contains("no network egress")))
  }

  test("fake fetcher: listing discovery -> fixed-width read -> staged merge, incrementally") {
    val dir = Files.createTempDirectory("fetch_e2e").toString
    Files.write(Paths.get(s"$dir/day1.txt"), "# header\n101 3.5\n102 -1.25\n".getBytes)
    Files.write(Paths.get(s"$dir/day2.txt"), "103 7.0\n".getBytes)
    val base = s"file://$dir"
    val listingUrl = s"$base/"
    var pages = Map(
      listingUrl -> listingHtml(Seq(
        "day1.txt" -> "2024-01-10 06:00",
        "day2.txt" -> "2024-01-11 06:00"))
    )
    val fetcher = Fetcher(url =>
      pages.getOrElse(url, throw new java.io.IOException(s"404: $url")))
    val staging = s"$dir/staging"
    val main = s"$dir/main"

    def runOnce(): graft.pipeline.PipelineRun = {
      var discovered: Seq[String] = Nil
      Pipeline("uscrn_live")
        .preflight("check_domain")(fetcher.checkConnection(listingUrl))
        .step("discover") {
          discovered = ListingDiscovery.discover(listingUrl, StagingSink.lastAdded(spark, main), fetcher)
        }
        .step("extract_stage")(
          if (discovered.nonEmpty)
            StagingSink.stage(FixedWidthText.readFiles(spark, discovered, schema), staging))
        .step("merge_to_main")(
          if (discovered.nonEmpty)
            StagingSink.mergeToMain(spark, staging, main, Seq("station_id"),
              clock = lit("2024-01-11 12:00:00").cast("timestamp")))
        .run()
    }

    assert(runOnce().succeeded)
    val loaded = spark.read.parquet(main)
    assert(loaded.count() == 3)
    assert(loaded.filter(col("station_id") === 102 && col("temp_c") === -1.25).count() == 1)

    // Second tick: nothing newer than the watermark — discovery must return
    // empty (the listing's mtimes predate main's date_added_utc), and main
    // must be unchanged after the run.
    assert(runOnce().succeeded)
    assert(spark.read.parquet(main).count() == 3)

    // Third tick: the source publishes a new file; only IT is discovered.
    Files.write(Paths.get(s"$dir/day3.txt"), "104 11.5\n101 3.5\n".getBytes)
    pages += listingUrl -> listingHtml(Seq(
      "day1.txt" -> "2024-01-10 06:00",
      "day2.txt" -> "2024-01-11 06:00",
      "day3.txt" -> "2024-09-01 06:00"))
    assert(runOnce().succeeded)
    val after = spark.read.parquet(main)
    // day3 carries a duplicate of station 101 — the keyed merge drops it.
    assert(after.count() == 4)
    assert(after.filter(col("station_id") === 104).count() == 1)
  }

  test("forecast pages fetched through the seam parse with HtmlTable (the NWS fetch site)") {
    // The reference's second fetch site (nws_dag get_forecast: one MapClick
    // page per location) through the same seam: the driver fetches the
    // (few) gate pages, parsing stays a distributed per-row operation. A
    // million-page corpus would fetch inside mapPartitions instead — the
    // parse half is identical either way.
    import org.apache.spark.sql.functions._
    def page(loc: String): String =
      new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          getClass.getResource(s"/nws/$loc.html").getPath)),
        java.nio.charset.StandardCharsets.UTF_8)
    val fetcher = Fetcher {
      case u if u.endsWith("lat=61") => page("anc")
      case u if u.endsWith("lat=64") => page("fai")
      case u                         => throw new java.io.IOException(s"404: $u")
    }
    import spark.implicits._
    val urls = Seq("ANC" -> "https://example.test/MapClick.php?lat=61",
                   "FAI" -> "https://example.test/MapClick.php?lat=64")
    val pages = urls.map { case (loc, u) => (loc, fetcher.fetch(u)) }.toDF("location", "html")
    val parsed = graft.sources.HtmlTable
      .landscapeRecords(pages, col("html"), 2, Seq("Hour"), cellTag = "font")
    val hours = parsed.groupBy("location").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hours.keySet == Set("ANC", "FAI"))
    assert(hours.values.forall(_ > 0), s"each fetched page must yield forecast records: $hours")
  }

  test("transient fetch failure inside a step is retried by the pipeline policy") {
    var calls = 0
    val flaky = Fetcher { url =>
      calls += 1
      if (calls < 3) throw new java.io.IOException(s"connection reset: $url")
      listingHtml(Seq("a.txt" -> "2024-01-10 06:00"))
    }
    var urls: Seq[String] = Nil
    val run = Pipeline("flaky_fetch")
      .withRetries(3, backoffMs = 1L)
      .step("discover") { urls = ListingDiscovery.discover("http://x/", None, flaky) }
      .run()
    assert(run.succeeded)
    assert(run.steps.head.attempts == 3)
    assert(urls == Seq("http://x/a.txt"))
  }
}
