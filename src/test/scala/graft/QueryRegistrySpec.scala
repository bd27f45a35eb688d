package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query executes and returns rows at sf0.001.
  * (Value-level correctness is the driver's DuckDB oracle gate; see
  * tools/check_oracle.py for the local mimic.)
  */
class QueryRegistrySpec extends AnyFunSuite with SparkSpec {

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} returns rows at sf0.001") {
      assert(q.build(spark, sfDir).count() > 0)
    }
  }

  test("every oracle key has a matching query and names are unique") {
    assert(QueryRegistry.oracleSql.keySet.subsetOf(QueryRegistry.queries.keySet))
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.length == names.length)
  }

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx quantiles hit the requested rank within tolerance per group") {
    // approx_percentile's guarantee is on RANK, not value (it returns an
    // actual element, no interpolation — in a sparse tail the nearest
    // element can sit a few percent away in value while being rank-exact).
    // So the gate checks rank: the fraction of each group's values at or
    // below the returned quantile must bracket the requested percentile.
    import org.apache.spark.sql.functions._
    val approx = QueryRegistry.queries("q_group_quantiles_approx")(spark, sfDir)
      .select("event_type", "p50", "p95")
    val ranks = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .join(broadcast(approx), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        avg((col("value") <= col("p50")).cast("double")).as("r50"),
        avg((col("value") <= col("p95")).cast("double")).as("r95")
      )
      .collect()
    assert(ranks.length == 5)
    for (r <- ranks) {
      val (g, r50, r95) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      assert(r50 >= 0.47 && r50 <= 0.53, s"$g p50 rank $r50")
      assert(r95 >= 0.93 && r95 <= 0.97, s"$g p95 rank $r95")
    }
  }
}
