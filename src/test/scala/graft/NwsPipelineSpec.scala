package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps

/** End-to-end re-expression of the reference's NWS forecast DAG
  * (nws_dag.py), now starting from RAW PAGE HTML the way the DAG does:
  * pre-fetched pages → HtmlTable.landscapeRecords (6th-table extract +
  * landscape transpose, utils.py:180-232) → column-name normalization
  * (`°()%`→pct, lowercase, spaces→_) → missing-value policy (gust ''→0,
  * wind_chill ''→NULL) → forward-fill of the carried-down date column →
  * fixed AKST→UTC +9h shift → composite-key dedup → typed schema cast.
  * Asserts exact output values at each policy point.
  */
class NwsPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("the full NWS flow: html extract, normalize, missing-value policy, ffill, tz shift, dedup, cast") {
    // One pre-fetched page per location (fixture HTML in test resources,
    // same shape as the NWS pages: nav tables first, then the landscape
    // forecast table with colspan dividers and <font>-wrapped cells; the
    // Date column is only populated on the first record of each half —
    // the reference forward-fills it).
    val pagesDir = getClass.getResource("/nws").getPath
    val pages = spark.read.option("wholetext", "true").text(pagesDir)
      .select(
        upper(regexp_extract(input_file_name(), "([a-z]+)\\.html", 1)).as("Location"),
        col("value").as("html")
      )
    val raw = graft.sources.HtmlTable
      .landscapeRecords(
        pages,
        col("html"),
        tableIdx = 2,
        cols = Seq("Date", "Hour", "Temperature °F", "Gust (mph)", "Wind Chill °F"),
        cellTag = "font"
      )
      .drop("html")
      // The transpose leaves '' in the gappy Date slots; the reference's
      // _ff_list treats '' as missing — make that explicit before ffill.
      .withColumn("Date", when(col("Date") === "", lit(null)).otherwise(col("Date")))

    assert(raw.count() == 5, "ANC yields 4 records (2 per half), FAI yields 1")

    val normalized = EtlOps.normalizeColumns(raw)
    assert(
      normalized.columns.toSeq ==
        Seq("location", "date", "hour", "temperature_f", "gust_mph", "wind_chill_f")
    )

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

    val rows = typed
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
    assert(typed.schema("temperature_f").dataType.typeName == "double")
  }
}
