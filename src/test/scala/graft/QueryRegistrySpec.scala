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
}
