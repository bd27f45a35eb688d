package graft

import graft.pipeline.SourceRegistry
import org.scalatest.funsuite.AnyFunSuite

class SourceConfigSpec extends AnyFunSuite {

  private val text =
    """# registry — same shape as the reference's sources.yaml
      |uscrn.description = Hourly historical weather data from USCRN
      |uscrn.index       = https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/
      |uscrn.updates     = https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/updates/
      |uscrn.readme      = https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/readme.txt
      |uscrn.table       = uscrn_main
      |uscrn.schedule    = 0 10 * * *
      |uscrn.keys        = station_location, utc_datetime
      |nws.index         = https://forecast.weather.gov/MapClick.php
      |nws.schedule      = 0 * * * *
      |""".stripMargin

  test("parses multiple sources with typed fields, url colons intact") {
    val reg = SourceRegistry.parse(text)
    assert(reg.keySet == Set("uscrn", "nws"))
    val u = reg("uscrn")
    assert(u.index.contains("https://www.ncei.noaa.gov/pub/data/uscrn/products/hourly02/"))
    assert(u.schedule.contains("0 10 * * *"))
    assert(u.keys == Seq("station_location", "utc_datetime"))
    assert(u.table.contains("uscrn_main"))
    // Non-reserved fields land in extra without schema churn.
    assert(u.extra.get("readme").exists(_.endsWith("readme.txt")))
    assert(reg("nws").keys.isEmpty)
  }

  test("require() flags missing fields at declaration time") {
    val reg = SourceRegistry.parse(text)
    assert(reg("uscrn").require("index", "schedule", "table", "keys").isRight,
      "declared keys must satisfy require(\"keys\")")
    val missing = reg("nws").require("table", "updates", "readme", "keys")
    assert(missing.isLeft)
    val msg = missing.left.toOption.get
    assert(msg.contains("table") && msg.contains("updates") && msg.contains("readme")
      && msg.contains("keys"))
  }

  test("a typo'd key without the source.field shape fails the parse loudly") {
    val bad = text + "uscrnbroken = oops\n"
    val e = intercept[IllegalArgumentException](SourceRegistry.parse(bad))
    assert(e.getMessage.contains("uscrnbroken"))
  }

  test("schedule from config drives the cron scheduler") {
    val reg = SourceRegistry.parse(text)
    val cron = graft.pipeline.CronExpr.parse(reg("uscrn").schedule.get)
    val t = java.time.LocalDateTime.of(2024, 1, 15, 9, 0).toInstant(java.time.ZoneOffset.UTC)
    val next = java.time.LocalDateTime.of(2024, 1, 15, 10, 0).toInstant(java.time.ZoneOffset.UTC)
    assert(cron.nextAfter(t) == next)
  }
}
