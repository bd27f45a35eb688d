package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_entity_match's scale contract (VERDICT r7 lead item): the blocking
  * key must not be fixed-cardinality. The 1-deletion-neighborhood key
  * guarantees recall for edit distance ≤ 1 by pigeonhole (a substitution
  * deleted at the edited position equalizes both strings; an indel's
  * shorter string is literally a deletion of the longer), and its block
  * sizes are governed by duplicate multiplicity — NOT corpus size — so
  * Σ|block|² stays linear as the corpus grows.
  */
class EntityMatchSpec extends AnyFunSuite with SparkSpec {

  test("recall: every planted edit-distance-≤1 pair is found, including first-char and indel edits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("entity_match").toString
    // (custkey, name, nationkey, segment) — pairs planted to cover every
    // edit type the pigeonhole argument must survive:
    //   1/2  mid-string substitution        5/6  identical names (edit 0)
    //   3/4  FIRST-char substitution (the case a plain prefix key loses)
    //   7/8  insertion at the end           9/10 deletion of the first char
    //   11/12 edit distance 2 — must NOT match
    //   13/14 edit distance 1 but different nation — business rule: no match
    Seq(
      (1L, "Customer#000000001", 1, "BUILDING"),
      (2L, "Customer#000010001", 1, "BUILDING"),
      (3L, "Customer#000000002", 2, "MACHINERY"),
      (4L, "Xustomer#000000002", 2, "MACHINERY"),
      (5L, "Customer#000000005", 3, "AUTOMOBILE"),
      (6L, "Customer#000000005", 3, "AUTOMOBILE"),
      (7L, "Customer#000000007", 4, "HOUSEHOLD"),
      (8L, "Customer#000000007X", 4, "HOUSEHOLD"),
      (9L, "Customer#000000009", 5, "FURNITURE"),
      (10L, "ustomer#000000009", 5, "FURNITURE"),
      (11L, "Customer#000000011", 6, "BUILDING"),
      (12L, "Customer#000099911", 6, "BUILDING"),
      (13L, "Customer#000000013", 7, "MACHINERY"),
      (14L, "Customer#000000014", 8, "MACHINERY")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = SparkEntry
      .queries("q_entity_match")(spark, dir)
      .select("a_key", "b_key", "edit_dist")
      .as[(Long, Long, Int)]
      .collect()
      .toSet
    assert(got === Set((1L, 2L, 1), (3L, 4L, 1), (5L, 6L, 0), (7L, 8L, 1), (9L, 10L, 1)))
  }

  test("scale: max block size stays ~constant under a 10× corpus while key cardinality grows with n") {
    import spark.implicits._
    def blockStats(n: Int): (Long, Long) = {
      // Duplicate multiplicity fixed at 2 regardless of n — the quantity
      // that legitimately sets block size. Sequential digit names are the
      // adversarial case (many 1-digit-apart neighbors share keys).
      val names = (0 until n).flatMap(i => Seq.fill(2)(f"Name#$i%07d")).toDF("name")
      val keyed = names.select(explode(AnalyticQueries.deletionKeys(col("name"))).as("k"))
      val hist = keyed.groupBy("k").count()
      val maxBlock = hist.agg(max("count")).as[Long].head()
      val nKeys = hist.count()
      (maxBlock, nKeys)
    }
    val (m1, k1) = blockStats(500)
    val (m10, k10) = blockStats(5000)
    // A fixed-cardinality key (nation×segment ≈ 125 blocks) would grow
    // max-block 10× here; deletion keys must stay within digit-collision
    // noise of constant, and the key space itself must scale with n.
    // NOTE: the 2× / ≤100 thresholds are calibrated to THIS Name#%07d
    // sequential-digit corpus (multiplicity 2, 7-digit zero-padded
    // format); digit-insertion neighborhoods widen slightly with the
    // number range, which the 2× headroom absorbs at n=5000. Editing the
    // corpus shape or format width requires re-deriving the bounds.
    assert(m10 <= 2 * m1, s"max block grew $m1 -> $m10 under a 10x corpus — blocking is not corpus-scaled")
    assert(m10 <= 100, s"max block $m10 should be bounded by duplicate multiplicity, not n")
    assert(k10 >= 8 * k1, s"key cardinality must grow with the corpus: $k1 -> $k10")
  }
}
