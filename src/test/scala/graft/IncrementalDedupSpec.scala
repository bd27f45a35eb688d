package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the incremental NEAR-dup shape (q_dedup_incremental_ngram +
  * its 100 TB production twin incrementalMinhashMatches): the registered
  * exact-inverted-index form is DuckDB-hash-checked, so these specs pin
  * what the hash can't — the planted batch semantics, the minhash twin's
  * recall against the exact match set, verify soundness, and the
  * candidate-generation plan shape.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val report =
    QueryRegistry.queries("q_dedup_incremental_ngram")(spark, sfDir).cache()

  test("planted truncated variants are caught, genuinely-new batch docs survive") {
    val rows = report
      .select(col("doc_id"), col("is_new"))
      .as[(Long, Boolean)]
      .collect()
    val (planted, fresh) = rows.partition(_._1 >= 1000000L)
    assert(planted.nonEmpty && fresh.nonEmpty)
    // Every planted row is an 85%-truncation of an index doc — J far above
    // the 0.5 floor; the exact index must catch ALL of them.
    assert(planted.forall(!_._2), s"planted near-dups graded new: ${planted.filter(_._2).take(5).toSeq}")
    // The ≡4 docs are mostly novel content and mostly survive — but the
    // testdata generator plants its own organic near-dups (e.g. a doc
    // reissued with a one-word suffix), so a small fraction legitimately
    // matches; those matches are genuine J ≥ 0.5 pairs (next test).
    val survivors = fresh.count(_._2)
    assert(survivors >= (fresh.length * 0.9).toInt,
      s"only $survivors of ${fresh.length} novel docs survived")
  }

  test("every reported match verifies at J ≥ 0.5 and points into the index corpus") {
    val matches = report.filter(!col("is_new"))
      .select(col("match_id"), col("jaccard"))
      .as[(Long, Double)]
      .collect()
    assert(matches.nonEmpty)
    matches.foreach { case (m, j) =>
      assert(j >= 0.5 && j <= 1.0, s"match $m at J=$j")
      assert(m % 5 != 4 && m < 1000000L, s"match_id $m is not an index doc")
    }
  }

  test("minhash twin: recall ≥ 0.95 of the exact match set, zero sub-threshold matches") {
    val exact = report.filter(!col("is_new"))
      .select(col("doc_id"), col("match_id"))
      .as[(Long, Long)]
      .collect()
      .toSet
    val twin = SimilarityQueries.incrementalMinhashMatches(spark, sfDir)
    val twinPairs = twin.select(col("batch_id"), col("match_id")).as[(Long, Long)].collect().toSet
    // Nonempty FIRST: with zero twin matches, min(jaccard) below is NULL
    // and decoding it into a primitive Double would NPE — this assertion
    // is the diagnosis that failure mode deserves.
    assert(twinPairs.nonEmpty, "minhash twin returned zero matches")
    val recall = (exact & twinPairs).size.toDouble / exact.size
    assert(recall >= 0.95, s"minhash twin recall $recall over ${exact.size} exact matches")
    // Soundness: the twin's own verify floor holds.
    val minJ = twin.agg(min(col("jaccard"))).as[Double].head()
    assert(minJ >= 0.5, s"sub-threshold match at J=$minJ")
    // Survivor consistency, both directions. A doc the exact index grades
    // NEW can only lose that status in the twin through a mod-P-domain
    // verify lifting a borderline pair (the q_dedup_minhash guard-band
    // argument) — essentially never on this corpus. A doc the exact index
    // MATCHES can survive the twin only through a banding recall miss —
    // bounded by the recall gate above.
    val exactSurvivors = report.filter(col("is_new")).select(col("doc_id")).as[Long].collect().toSet
    val batchIds = SimilarityQueries.incrementalNearBatch(spark, sfDir)
      .select(col("doc_id")).as[Long].collect().toSet
    val twinSurvivors = batchIds -- twinPairs.map(_._1)
    assert((exactSurvivors -- twinSurvivors).isEmpty,
      s"twin matched docs the exact 64-bit verify grades new: ${(exactSurvivors -- twinSurvivors).take(5)}")
    assert((twinSurvivors -- exactSurvivors).size <= math.max(1, (0.05 * exact.size).toInt),
      s"twin misses too many matches: ${(twinSurvivors -- exactSurvivors).size}")
  }

  test("twin candidates come from the band-bucket equi-join — no cartesian, batch side probes") {
    val p = SimilarityQueries.incrementalMinhashMatches(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), s"cross join in candidate generation:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"non-equi join in candidate generation:\n$p")
  }
}
