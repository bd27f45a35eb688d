package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The geospatial scale twin's two safety claims (q_nearest_station_cells):
  * the 3×3 cell candidate set provably contains the true nearest station
  * (so the cell argmin IS the global argmin — the convergence the oracle
  * hash-checks cross-engine), and the geometric margin behind that claim
  * actually holds on the synthesized grid (so a future fixture tweak that
  * erodes the margin fails HERE with a distance, not downstream as an
  * unexplained row diff).
  */
class NearestStationCellsSpec extends AnyFunSuite with SparkSpec {

  private def stations = spark.range(2048).select(
    col("id").as("station_id"),
    (col("id") % 64 * 36 + col("id") * 7 % 5 * 2).as("sxu"),
    (expr("id div 64") * 52 + col("id") * 11 % 5 * 2).as("syu"))

  test("cells cover the argmin: cell assignment equals the broadcast brute-force argmin") {
    val cells = QueryRegistry.queries("q_nearest_station_cells")(spark, sfDir)
      .select("c_custkey", "station_id", "dist_deg")
    val pts = Tables.customer(spark, sfDir).select(
      col("c_custkey"),
      (col("c_custkey") * 13 % 2268).cast("long").as("pxu"),
      (col("c_custkey") * 17 % 1612).cast("long").as("pyu"))
    val d2u = (col("pxu") - col("sxu")) * (col("pxu") - col("sxu")) +
      (col("pyu") - col("syu")) * (col("pyu") - col("syu"))
    val brute = pts
      .crossJoin(broadcast(stations))
      .groupBy("c_custkey")
      .agg(min(struct(d2u.as("d2u"), col("station_id").as("station_id"))).as("m"))
      .select(
        col("c_custkey"),
        col("m.station_id").as("station_id"),
        round(sqrt(col("m.d2u").cast("double")) * lit(0.0078125), 6).as("dist_deg"))
    assert(cells.exceptAll(brute).isEmpty && brute.exceptAll(cells).isEmpty,
      "cell-join argmin must equal the brute-force argmin row for row")
  }

  test("the coverage margin holds: every true nearest is strictly inside one cell pitch") {
    // The geometric argument the query's preamble makes: with pitch 36×52
    // units and jitter ≤ 8, the true nearest distance is ≤ √(26²+34²) ≈
    // 42.8 < 52 = cell size, and any non-candidate is provably > 52 away.
    // Measure the worst case over a dense systematic probe grid of the
    // whole coordinate box (coprime strides cover it evenly — ~3.7k
    // probes, independent of which custkeys the fixture happens to hold):
    // max nearest d² must stay < 52².
    val pts = spark.range(2268 * 1612 / 997).select( // ~3.7k systematic probes
      (col("id") * 997 % 2268).as("pxu"),
      (col("id") * 991 % 1612).as("pyu"))
    val d2u = (col("pxu") - col("sxu")) * (col("pxu") - col("sxu")) +
      (col("pyu") - col("syu")) * (col("pyu") - col("syu"))
    val worst = pts
      .crossJoin(broadcast(stations))
      .groupBy("pxu", "pyu")
      .agg(min(d2u).as("d2min"))
      .agg(max(col("d2min")))
      .head().getLong(0)
    assert(worst < 52L * 52L, s"nearest-station margin eroded: worst d2=$worst >= 2704")
  }
}
