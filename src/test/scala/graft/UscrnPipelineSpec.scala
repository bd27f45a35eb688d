package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps
import graft.pipeline.Pipeline
import graft.sources.{FixedWidthText, StagingSink}

/** End-to-end re-expression of the reference's USCRN DAG (uscrn_dag.py),
  * DECLARED as a [[graft.pipeline.Pipeline]] the way the reference declares
  * its task chain (check_domain >> check_last_added >> extract >> transform
  * >> load_staging >> insert): whitespace-text extract → timestamp build →
  * sentinel-guarded C→F conversion → locations dimension join →
  * composite-key dedup → staging load → staging→main insert with audit
  * timestamp → incremental second run. Steps hand off through the staging
  * path (storage, not memory), so each step is a retry-safe resume point.
  * The spec asserts the final main table exactly, including idempotency of
  * the re-run — the property the reference gets from its watermark +
  * pre-load dedup.
  */
class UscrnPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val schema = StructType(
    Seq(
      StructField("wbanno", LongType),
      StructField("utc_date", LongType),
      StructField("utc_time", LongType),
      StructField("t_calc", DoubleType)
    )
  )

  // The reference externalizes source declarations in
  // airflow/dags/config/sources.yaml (USCRN: index/updates urls) and its
  // DAG reads the registry instead of hard-coding; same shape here through
  // the typed loader.
  private val uscrnCfg = graft.pipeline.SourceRegistry.parse(
    """uscrn.description = Hourly historical weather data from USCRN
      |uscrn.index       = https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/
      |uscrn.updates     = https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/updates/
      |uscrn.readme      = https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/readme.txt
      |uscrn.table       = uscrn_main
      |uscrn.schedule    = 0 10 * * *
      |uscrn.keys        = station_location, utc_datetime
      |""".stripMargin)("uscrn")

  private def uscrnPipeline(rawDir: String, staging: String, main: String): Pipeline = {
    val locations = Seq((23583L, "Fairbanks AK"), (25380L, "Nome AK"))
      .toDF("wbanno", "station_location")

    Pipeline(uscrnCfg.name)
      // The reference DAG's cadence (uscrn_dag.py:271-289:
      // schedule_interval='0 10 * * *', catchup=False) read from the
      // source registry, like the reference reads its config.
      .schedule(uscrnCfg.schedule.get)
      // The reference pings its source domain before running (check_domain,
      // uscrn_dag.py:90); here the "domain" is the raw landing dir.
      .preflight("check_source") {
        if (new java.io.File(rawDir).isDirectory) Right(())
        else Left(s"raw dir $rawDir unreachable")
      }
      // check_last_added (uscrn_dag.py:96): the incremental cutoff — not
      // used to filter the tiny fixture batch, but the step MUST resolve
      // (None on first run, the audit max afterwards) like the reference's.
      .step("check_last_added") { StagingSink.lastAdded(spark, main); () }
      .step("extract_transform_stage") {
        val parsed = FixedWidthText.read(spark, rawDir, schema)
        val transformed = parsed
          .withColumn("utc_datetime", EtlOps.timestampFromParts(col("utc_date"), col("utc_time")))
          .withColumn("t_calc_f", EtlOps.celsiusToFahrenheit(col("t_calc")))
          .join(broadcast(locations), Seq("wbanno"))
        val deduped = EtlOps.dedupByKey(transformed, Seq("station_location", "utc_datetime"), "utc_time")
          .select("wbanno", "station_location", "utc_datetime", "t_calc", "t_calc_f")
        StagingSink.stage(deduped, staging)
      }
      .step("merge_to_main") {
        StagingSink.mergeToMain(
          spark,
          staging,
          main,
          keyCols = uscrnCfg.keys,
          clock = lit("2026-01-01 00:00:00").cast("timestamp")
        )
      }
  }

  private def runBatch(rawDir: String, staging: String, main: String): Unit = {
    val run = uscrnPipeline(rawDir, staging, main).run()
    assert(run.succeeded, s"pipeline run failed: ${run.status} ${run.alerts}")
    assert(run.steps.map(_.name) ==
      Seq("check_last_added", "extract_transform_stage", "merge_to_main"))
  }

  test("the full USCRN flow: parse, convert, join, dedup, staged load, incremental re-run") {
    val base = Files.createTempDirectory("uscrn").toString
    val raw1 = s"$base/raw1"; val raw2 = s"$base/raw2"
    Files.createDirectories(Paths.get(raw1)); Files.createDirectories(Paths.get(raw2))

    // Batch 1: one in-file duplicate key (same station+datetime), one
    // sentinel temperature (-9999.0 must NOT be converted to Fahrenheit).
    Files.writeString(
      Paths.get(raw1, "CRNH0203-2024-AK_Fairbanks.txt"),
      """23583 20240101 0100 -3.5
        |23583 20240101 0100 -3.5
        |23583 20240101 0200 -9999.0
        |25380 20240101 0100 2.0
        |""".stripMargin
    )
    val staging = s"$base/staging"; val main = s"$base/main"
    runBatch(raw1, staging, main)

    val after1 = spark.read.parquet(main)
    assert(after1.count() == 3, "in-file duplicate must collapse to one row")
    val sentinel = after1.filter(col("t_calc") === -9999.0).select("t_calc_f").as[Double].head()
    assert(sentinel == -9999.0, "sentinel rows must pass through unconverted")
    val converted = after1
      .filter(col("wbanno") === 25380L)
      .select("t_calc_f")
      .as[Double]
      .head()
    assert(converted == 2.0 * 9 / 5 + 32)
    assert(after1.columns.contains("date_added_utc"))

    // Batch 2: overlaps batch 1 on the Fairbanks 01:00 reading (must not
    // duplicate) and adds one genuinely new hour.
    Files.writeString(
      Paths.get(raw2, "CRNH0203-2024-AK_Fairbanks.txt"),
      """23583 20240101 0100 -3.5
        |23583 20240101 0300 -5.0
        |""".stripMargin
    )
    runBatch(raw2, staging, main)

    val after2 = spark.read.parquet(main)
    assert(after2.count() == 4, "re-run must add only the new hour")
    assert(
      after2.filter(col("station_location") === "Fairbanks AK").count() == 3,
      "overlapping reading must not duplicate"
    )

    // Third run of the identical batch: a strict no-op.
    runBatch(raw2, staging, main)
    assert(spark.read.parquet(main).count() == 4)
  }

  test("scheduled USCRN over a simulated week: missed days collapse to one run, data lands once") {
    val base = Files.createTempDirectory("uscrn_sched").toString
    val raw = s"$base/raw"
    Files.createDirectories(Paths.get(raw))
    Files.writeString(
      Paths.get(raw, "CRNH0203-2024-AK_Fairbanks.txt"),
      """23583 20240101 0100 -3.5
        |25380 20240101 0100 2.0
        |""".stripMargin
    )
    val pipe = uscrnPipeline(raw, s"$base/staging", s"$base/main")
    assert(pipe.cron.isDefined, "the reference cadence must be declared on the pipeline")

    // The host loop: each invocation passes (lastRun, now); catchup=false
    // is the reference DAG's setting.
    var lastRun: Option[java.time.Instant] = None
    var totalRuns = 0
    def host(now: String): Int = {
      val runs = graft.pipeline.Scheduler
        .runDue(pipe, lastRun, java.time.Instant.parse(now), catchup = false)
      runs.foreach { case (tick, r) =>
        assert(r.succeeded, s"tick $tick failed: ${r.status}")
        lastRun = Some(tick)
      }
      totalRuns += runs.size
      runs.size
    }

    // First-ever invocation Monday 09:00 — before today's tick, so it
    // anchors at SUNDAY 10:00 and fires exactly once (a fixed lookback
    // would have fired zero times).
    assert(host("2026-01-05T09:00:00Z") == 1)
    assert(lastRun.contains(java.time.Instant.parse("2026-01-04T10:00:00Z")))
    // Monday afternoon: Monday's 10:00 tick is now due.
    assert(host("2026-01-05T12:30:00Z") == 1)
    // A second Monday poll: nothing new.
    assert(host("2026-01-05T23:55:00Z") == 0)
    // Host down Tue-Thu. Friday 11:00 sees 4 missed ticks (Tue, Wed, Thu,
    // Fri) but catchup=false runs ONLY the latest — a DAG paused for days
    // runs once, not four times.
    val missed = pipe.cron.get.ticksBetween(
      lastRun.get, java.time.Instant.parse("2026-01-09T11:00:00Z"))
    assert(missed.size == 4, s"expected 4 missed daily ticks, got $missed")
    assert(host("2026-01-09T11:00:00Z") == 1)
    assert(lastRun.contains(java.time.Instant.parse("2026-01-09T10:00:00Z")))

    assert(totalRuns == 3, s"simulated week must execute exactly 3 runs, got $totalRuns")
    // Three executions of the same batch, but the staging→main merge is
    // the idempotency boundary: the data landed exactly once.
    assert(spark.read.parquet(s"$base/main").count() == 2,
      "re-run ticks must not duplicate rows through StagingSink")
  }

  test("listing-driven discovery: two runs, the watermark prunes already-ingested files") {
    // The reference's entry seam (get_new_file_urls, uscrn_dag.py:115-132):
    // the updates page's "Last modified" column, filtered by the warehouse
    // watermark, decides WHICH files the run reads at all. Here the
    // listing is an Apache-style index fixture and the "urls" are local
    // paths; the discovery → fixed-width read → staged merge loop runs
    // end-to-end twice, and run 2 must scan ONLY the file that appeared
    // after run 1's audit watermark.
    import graft.sources.ListingDiscovery
    val base = Files.createTempDirectory("uscrn_listing").toString
    val raw = s"$base/raw"
    Files.createDirectories(Paths.get(raw))
    Files.writeString(Paths.get(raw, "fileA.txt"), "23583 20240101 0100 -3.5\n")
    Files.writeString(Paths.get(raw, "fileB.txt"), "25380 20240101 0100 2.0\n")
    Files.writeString(Paths.get(raw, "fileC.txt"), "23583 20240101 0200 -4.0\n")

    def listing(files: Seq[(String, String)]): String = {
      val rows = files.map { case (n, ts) =>
        s"""<tr><td><img src="/icons/text.gif" alt="[TXT]"></td><td><a href="$n">$n</a></td><td>$ts</td><td>12K</td><td>&nbsp;</td></tr>"""
      }.mkString("\n")
      s"""<html><body><h1>Index of /updates/2024</h1><table>
         |<tr><th><img src="/icons/blank.gif" alt="[ICO]"></th><th>Name</th><th>Last modified</th><th>Size</th><th>Description</th></tr>
         |<tr><th colspan="5"><hr></th></tr>
         |<tr><td><img src="/icons/back.gif" alt="[PARENTDIR]"></td><td><a href="..">Parent Directory</a></td><td>&nbsp;</td><td>-</td><td>&nbsp;</td></tr>
         |$rows
         |<tr><th colspan="5"><hr></th></tr>
         |</table></body></html>""".stripMargin
    }

    val locations = Seq((23583L, "Fairbanks AK"), (25380L, "Nome AK"))
      .toDF("wbanno", "station_location")
    val staging = s"$base/staging"; val main = s"$base/main"

    def ingest(listingHtml: String, clock: String): Seq[String] = {
      val watermark = StagingSink.lastAdded(spark, main)
      val discovered = ListingDiscovery.newFilePaths(listingHtml, watermark, raw)
      if (discovered.nonEmpty) {
        val parsed = FixedWidthText.readFiles(spark, discovered, schema)
        val transformed = parsed
          .withColumn("utc_datetime", EtlOps.timestampFromParts(col("utc_date"), col("utc_time")))
          .withColumn("t_calc_f", EtlOps.celsiusToFahrenheit(col("t_calc")))
          .join(broadcast(locations), Seq("wbanno"))
        val deduped = EtlOps.dedupByKey(transformed, Seq("station_location", "utc_datetime"), "utc_time")
          .select("wbanno", "station_location", "utc_datetime", "t_calc", "t_calc_f")
        StagingSink.stage(deduped, staging)
        StagingSink.mergeToMain(spark, staging, main,
          keyCols = Seq("station_location", "utc_datetime"),
          clock = lit(clock).cast("timestamp"))
      }
      discovered
    }

    // Run 1: empty main → no watermark → both listed files ingest.
    val l1 = listing(Seq("fileA.txt" -> "2024-01-01 09:00", "fileB.txt" -> "2024-01-02 09:00"))
    val d1 = ingest(l1, "2024-01-02 12:00:00")
    assert(d1 == Seq(s"$raw/fileA.txt", s"$raw/fileB.txt"))
    assert(spark.read.parquet(main).count() == 2)

    // Run 2: fileC appears in the listing, modified AFTER run 1's audit
    // watermark; A and B are older — only C may be read.
    val l2 = listing(Seq(
      "fileA.txt" -> "2024-01-01 09:00",
      "fileB.txt" -> "2024-01-02 09:00",
      "fileC.txt" -> "2024-01-03 09:00"))
    val d2 = ingest(l2, "2024-01-03 12:00:00")
    assert(d2 == Seq(s"$raw/fileC.txt"), s"watermark must prune already-ingested files, got $d2")
    val after2 = spark.read.parquet(main)
    assert(after2.count() == 3)

    // Run 3: unchanged listing, advanced watermark — discovery is empty
    // and the run is a no-op (the reference's quiet-day behavior).
    assert(ingest(l2, "2024-01-04 12:00:00").isEmpty)
    assert(spark.read.parquet(main).count() == 3)
  }

  test("unreachable source: preflight alerts and skips, main is never touched") {
    val base = Files.createTempDirectory("uscrn_skip").toString
    val run = uscrnPipeline(s"$base/no_such_dir", s"$base/staging", s"$base/main").run()
    run.status match {
      case graft.pipeline.RunStatus.PreflightSkipped("check_source", reason) =>
        assert(reason.contains("unreachable"))
      case other => fail(s"expected PreflightSkipped, got $other")
    }
    assert(run.steps.isEmpty, "no step may run after a failed preflight")
    assert(!new java.io.File(s"$base/main").exists(), "a skipped run must not create main")
  }
}
