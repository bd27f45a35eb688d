package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the banded-audit machinery's self-review fixes:
  * a degenerate ANN path must surface as FALSE flags (not a vanished
  * row), the ball-audit sample must be fixed-SIZE (not fixed-fraction),
  * and base-id sampling must keep a planted pair's two ends together.
  */
class BandedAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("annBandedReport keeps a query with zero ANN candidates and fails its flags") {
    // Empty candidate set for every query: the report must still emit all
    // 10 rows (left join from the exact side), with ratio 0 / hits 0
    // driving every band FALSE — a silent row drop would surface only as
    // an undiagnostic row-count mismatch at the driver gate.
    val emptyAnn = Seq.empty[(Long, Long, Double)].toDF("query_id", "neighbor_id", "cos_sim")
    val rep = SimilarityQueries
      .annBandedReport(spark, sfDir, emptyAnn, meanFloor = 0.9, recallFloor = 12)
      .collect()
    assert(rep.length == 10, "every brute-force query row must survive an empty ANN side")
    assert(rep.forall(r => !r.getBoolean(3) && !r.getBoolean(4) && !r.getBoolean(5)),
      "top1/mean/recall bands must all be FALSE when ANN returns nothing")
  }

  test("ball-audit sample modulus pins a fixed-size sample at any corpus size") {
    // Test regime unchanged (mod 53 up to ~26.5k docs), then the modulus
    // grows linearly so the sampled doc count — and the quadratic
    // brute-force ball — stays ~constant at any scale.
    assert(SimilarityQueries.sampleModulus(500L) == 53L)
    assert(SimilarityQueries.sampleModulus(26000L) == 53L)
    assert(SimilarityQueries.sampleModulus(1000000L) == 2000L)
    assert(SimilarityQueries.sampleModulus(1000000000L) == 2000000L)
    for (n <- Seq(100000L, 10000000L, 1000000000L)) {
      val sampled = n / SimilarityQueries.sampleModulus(n)
      assert(sampled >= 250 && sampled <= 500, s"sample size $sampled at n=$n must stay ~constant")
    }
  }

  test("base-id sampling keeps a planted pair's two ends in the same sample") {
    // 1e6 ≡ 49 (mod 53): a raw-id mod rule can never select both ends of
    // a planted (i, i+1e6) pair, which made the first ball audit vacuous.
    // The base-id predicate must classify both ends identically.
    val ids = Seq(0L, 53L, 54L, 106L, 1000000L, 1000053L, 1000054L).toDF("doc_id")
    val got = ids
      .select(col("doc_id"), SimilarityQueries.inSampleBase(53L)(col("doc_id")).as("s"))
      .as[(Long, Boolean)]
      .collect()
      .toMap
    assert(got(0L) && got(1000000L), "base 0 and its planted twin must both be sampled")
    assert(got(53L) && got(1000053L), "base 53 and its planted twin must both be sampled")
    assert(!got(54L) && !got(1000054L), "unsampled base and twin must agree too")
    assert(got(106L))
  }
}
