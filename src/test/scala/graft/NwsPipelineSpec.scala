package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps
import graft.pipeline.Pipeline
import graft.sources.StagingSink

/** End-to-end re-expression of the reference's NWS forecast DAG
  * (nws_dag.py:224-239), DECLARED as a [[graft.pipeline.Pipeline]] the way
  * the DAG declares its chain (get_forecast >> transform >> load_staging >>
  * insert), starting from RAW PAGE HTML the way the DAG does: pre-fetched
  * pages → HtmlTable.landscapeRecords (landscape transpose, utils.py:
  * 180-232) → column-name normalization (`°()%`→pct, lowercase, spaces→_)
  * → missing-value policy (gust ''→0, wind_chill ''→NULL) → forward-fill
  * of the carried-down date column → fixed AKST→UTC +9h shift →
  * composite-key dedup → typed schema cast → staged load → keyed merge to
  * main. Steps hand off through parquet paths (extract lands before
  * transform reads), so each step is a retry-safe resume point. Asserts
  * exact output values at each policy point.
  */
class NwsPipelineSpec extends AnyFunSuite with SparkSpec {

  // Source declaration through the typed registry, mirroring the
  // reference's externalized config (sources.yaml shape).
  private val nwsCfg = graft.pipeline.SourceRegistry.parse(
    """nws.description = NWS 48h tabular forecast pages
      |nws.index       = https://forecast.weather.gov/MapClick.php
      |nws.table       = nws_main
      |nws.schedule    = 0 * * * *
      |nws.keys        = location, lst_datetime
      |""".stripMargin)("nws")

  private def nwsPipeline(base: String): Pipeline = {
    val extracted = s"$base/extracted"
    val staging = s"$base/staging"
    val main = s"$base/main"

    Pipeline(nwsCfg.name)
      // The reference DAG's cadence (nws_dag.py:224-236: hourly,
      // catchup=False) read from the source registry.
      .schedule(nwsCfg.schedule.get)
      .preflight("check_pages") {
        if (getClass.getResource("/nws") != null) Right(()) else Left("no fetched pages")
      }
      // One pre-fetched page per location (fixture HTML in test resources,
      // same shape as the NWS pages: nav tables first, then the landscape
      // forecast table with colspan dividers and <font>-wrapped cells; the
      // Date column is only populated on the first record of each half —
      // the reference forward-fills it).
      .step("extract_pages") {
        val pagesDir = getClass.getResource("/nws").getPath
        val pages = spark.read.option("wholetext", "true").text(pagesDir)
          .select(
            upper(regexp_extract(input_file_name(), "([a-z]+)\\.html", 1)).as("Location"),
            col("value").as("html")
          )
        graft.sources.HtmlTable
          .landscapeRecords(
            pages,
            col("html"),
            tableIdx = 2,
            cols = Seq("Date", "Hour", "Temperature °F", "Gust (mph)", "Wind Chill °F"),
            cellTag = "font"
          )
          // Page-level provenance stamped on every extracted row, exactly
          // like the reference's last_update_nws column (utils.py:209-213).
          .withColumn("last_update_nws", graft.sources.HtmlTable.lastUpdateNws(col("html")))
          .drop("html")
          // The transpose leaves '' in the gappy Date slots; the reference's
          // _ff_list treats '' as missing — make that explicit before ffill.
          .withColumn("Date", when(col("Date") === "", lit(null)).otherwise(col("Date")))
          .write.mode("overwrite").parquet(extracted)
      }
      .step("transform_stage") {
        val raw = spark.read.parquet(extracted)
        val normalized = EtlOps.normalizeColumns(raw)
        val policied = normalized
          .withColumn("gust_mph", EtlOps.replaceSentinel(col("gust_mph"), lit(""), lit("0")))
          .withColumn("wind_chill_f", EtlOps.replaceSentinel(col("wind_chill_f"), lit(""), lit(null)))
        val filled = EtlOps.forwardFill(policied, Seq("location"), "hour", "date")
        val withTs = filled
          .withColumn(
            "lst_datetime",
            to_timestamp(concat_ws(" ", col("date"), concat(col("hour"), lit(":00"))))
          )
          .withColumn("utc_datetime", EtlOps.shiftHours(col("lst_datetime"), 9))
        val deduped = EtlOps.dedupByKey(withTs, Seq("location", "lst_datetime"), "hour")
        val typed = EtlOps.castColumns(
          deduped,
          Map("temperature_f" -> "double", "gust_mph" -> "double", "wind_chill_f" -> "double")
        )
        StagingSink.stage(typed, staging)
      }
      .step("merge_to_main") {
        StagingSink.mergeToMain(
          spark, staging, main,
          keyCols = nwsCfg.keys,
          clock = lit("2026-01-01 00:00:00").cast("timestamp")
        )
      }
  }

  test("the full NWS flow as a pipeline: extract, transform, staged load, merge") {
    val base = java.nio.file.Files.createTempDirectory("nws").toString
    val extracted = s"$base/extracted"
    val staging = s"$base/staging"
    val main = s"$base/main"

    val run = nwsPipeline(base).run()

    assert(run.succeeded, s"pipeline run failed: ${run.status} ${run.alerts}")
    assert(run.steps.map(_.name) == Seq("extract_pages", "transform_stage", "merge_to_main"))

    assert(spark.read.parquet(extracted).count() == 5,
      "ANC yields 4 records (2 per half), FAI yields 1")

    val out = spark.read.parquet(main)
    assert(out.columns.toSet ==
      Set("location", "date", "hour", "temperature_f", "gust_mph", "wind_chill_f",
        "lst_datetime", "utc_datetime", "date_added_utc", "last_update_nws"))

    // The page-level provenance column round-trips extract→staging→main
    // with the reference's exact normalization ("%I:%M%p %b %d %Y" — label,
    // pre-am/pm space, AKST and commas stripped; utils.py:174-188).
    val luByLoc = out.select("location", "last_update_nws").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(luByLoc == Map("ANC" -> "2:07pm Jan 1 2024", "FAI" -> "11:55am Jan 1 2024"))

    val rows = out
      .orderBy("location", "lst_datetime")
      .select("location", "date", "utc_datetime", "temperature_f", "gust_mph", "wind_chill_f")
      .collect()

    assert(rows.length == 4, "scrape-overlap duplicate must collapse")
    // Forward fill carried the date down the ANC block.
    assert(rows.take(3).forall(_.getString(1) == "2024-01-01"))
    // '' -> 0 for gust; '' -> NULL for wind chill.
    assert(rows(0).getDouble(4) == 0.0 && rows(0).getDouble(5) == -5.0)
    assert(rows(1).getDouble(4) == 20.0 && rows(1).isNullAt(5))
    // AKST -> UTC is +9h.
    assert(rows(0).getTimestamp(2).toString == "2024-01-01 10:00:00.0")
    // Typed cast applied.
    assert(out.schema("temperature_f").dataType.typeName == "double")

    // Re-running the whole pipeline (the next scheduled DAG run over the
    // same forecast pages) must be a no-op on main: the keyed merge is the
    // idempotency boundary, exactly like the reference's staging->insert.
    val run2 = Pipeline("nws_rerun")
      .step("merge_again") {
        StagingSink.mergeToMain(
          spark, staging, main,
          keyCols = Seq("location", "lst_datetime"),
          clock = lit("2026-01-02 00:00:00").cast("timestamp")
        )
      }
      .run()
    assert(run2.succeeded)
    assert(spark.read.parquet(main).count() == 4, "replayed merge must not duplicate")
  }

  test("scheduled NWS over a simulated day: hourly cadence, outage collapses, data lands once") {
    val base = java.nio.file.Files.createTempDirectory("nws_sched").toString
    val pipe = nwsPipeline(base)
    assert(pipe.cron.isDefined)

    var lastRun: Option[java.time.Instant] = None
    var totalRuns = 0
    def host(now: String): Int = {
      val runs = graft.pipeline.Scheduler
        .runDue(pipe, lastRun, java.time.Instant.parse(now), catchup = false)
      runs.foreach { case (tick, r) =>
        assert(r.succeeded, s"tick $tick failed: ${r.status} ${r.alerts}")
        lastRun = Some(tick)
      }
      totalRuns += runs.size
      runs.size
    }

    // First-ever poll 00:30 anchors at the 00:00 tick.
    assert(host("2026-01-05T00:30:00Z") == 1)
    // Steady hourly polls: one run each.
    assert(host("2026-01-05T01:05:00Z") == 1)
    assert(host("2026-01-05T01:45:00Z") == 0)
    assert(host("2026-01-05T02:02:00Z") == 1)
    // 7-hour outage: 09:10 sees 7 missed hourly ticks, catchup=false runs
    // the latest only.
    assert(pipe.cron.get
      .ticksBetween(lastRun.get, java.time.Instant.parse("2026-01-05T09:10:00Z")).size == 7)
    assert(host("2026-01-05T09:10:00Z") == 1)
    assert(lastRun.contains(java.time.Instant.parse("2026-01-05T09:00:00Z")))

    assert(totalRuns == 4)
    // Four full pipeline executions over the same forecast pages; the
    // keyed staging→main merge keeps the landed data exactly-once.
    assert(spark.read.parquet(s"$base/main").count() == 4,
      "hourly re-runs must not duplicate forecast rows")
  }
}
