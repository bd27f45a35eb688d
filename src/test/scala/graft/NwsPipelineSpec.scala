package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps

/** End-to-end re-expression of the reference's NWS forecast DAG
  * (nws_dag.py): scraped-table rows → column-name normalization
  * (`°()%`→pct, lowercase, spaces→_) → missing-value policy (gust ''→0,
  * wind_chill ''→NULL) → forward-fill of the carried-down date column →
  * fixed AKST→UTC +9h shift → composite-key dedup → typed schema cast.
  * Asserts exact output values at each policy point.
  */
class NwsPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("the full NWS flow: normalize, missing-value policy, ffill, tz shift, dedup, cast") {
    // Shape of the transposed forecast table: Date is only present on the
    // first row of each scrape block (the reference forward-fills it).
    val raw = Seq(
      // location, date(gappy), hour, temp_f, gust, wind_chill
      ("ANC", "2024-01-01", "01", "12", "", "-5"),
      ("ANC", null, "02", "11", "20", ""),
      ("ANC", null, "03", "10", "", ""),
      ("ANC", null, "03", "10", "", ""), // scrape overlap duplicate
      ("FAI", "2024-01-01", "01", "-2", "35", "-20")
    ).toDF("Location", "Date", "Hour", "Temperature °F", "Gust (mph)", "Wind Chill °F")

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
