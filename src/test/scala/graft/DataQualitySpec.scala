package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.{Date, Timestamp}

/** Semantics of the data-quality family (q_dq_checks / q_dq_freshness) on
  * fixtures with PLANTED violations: every constraint must fire exactly
  * when its violation exists, and the compliance fractions must be the
  * hand-computed ones.
  */
class DataQualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dqChecks: planted violations flip exactly their own checks") {
    val li = Seq(
      // (orderkey, linenumber, quantity, extendedprice, discount, returnflag, shipdate)
      (1L, 1, 10.0, 100.0, 0.05, "A", Date.valueOf("2024-01-01")),
      (1L, 1, 10.0, 100.0, 0.05, "N", Date.valueOf("2024-01-02")), // duplicate key
      (2L, 1, 10.0, -5.0, 0.10, "R", Date.valueOf("2024-01-03")), // negative price + discount > 0.08
      (9L, 1, 10.0, 100.0, 0.00, "X", null) // orphan + bad flag + null shipdate
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    val orders = Seq(1L, 2L).toDF("o_orderkey")
    val out = graft.operators.EtlOps
      .dqChecks(li, orders)
      .as[(String, Double, Double, Boolean)]
      .collect()
      .toSeq
    val byName = out.map(r => r._1 -> r).toMap
    assert(out.map(_._1) == out.map(_._1).sorted, "report must order by check_name")
    assert(byName("completeness_l_shipdate") == (("completeness_l_shipdate", 0.75, 1.0, false)))
    // 3 distinct keys over 4 rows.
    assert(byName("uniqueness_orderkey_linenumber")._2 == 0.75)
    assert(!byName("uniqueness_orderkey_linenumber")._4)
    assert(byName("range_l_discount_le_0.08") == (("range_l_discount_le_0.08", 0.75, 1.0, false)))
    assert(byName("set_l_returnflag") == (("set_l_returnflag", 0.75, 1.0, false)))
    assert(byName("nonneg_l_extendedprice") == (("nonneg_l_extendedprice", 0.75, 1.0, false)))
    assert(byName("referential_l_orderkey") == (("referential_l_orderkey", 0.75, 1.0, false)))
  }

  test("dqChecks: NULL-keyed rows count as distinct key values, not silently dropped") {
    // COUNT(DISTINCT a, b) drops NULL-bearing tuples — exactly the dirty
    // rows a DQ gate exists to see. The sentinel fingerprint must count
    // them: two NULL-key rows collapse to ONE distinct key (they carry the
    // same (~,~) fingerprint), so 4 rows / 3 distinct keys = 0.75.
    val li = Seq(
      (Option(1L), Option(1), 10.0, 100.0, 0.05, "A", Date.valueOf("2024-01-01")),
      (Option(2L), Option(1), 10.0, 100.0, 0.05, "N", Date.valueOf("2024-01-02")),
      (Option.empty[Long], Option.empty[Int], 10.0, 100.0, 0.05, "R", Date.valueOf("2024-01-03")),
      (Option.empty[Long], Option.empty[Int], 10.0, 100.0, 0.05, "A", Date.valueOf("2024-01-04"))
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    val orders = Seq(1L, 2L).toDF("o_orderkey")
    val out = graft.operators.EtlOps.dqChecks(li, orders).as[(String, Double, Double, Boolean)].collect()
    val uniq = out.find(_._1 == "uniqueness_orderkey_linenumber").get
    assert(uniq._2 == 0.75 && !uniq._4,
      s"NULL keys must participate in the uniqueness metric, got $uniq")
  }

  test("dqChecks: a clean table passes every check at metric 1.0") {
    val li = Seq(
      (1L, 1, 10.0, 100.0, 0.05, "A", Date.valueOf("2024-01-01")),
      (1L, 2, 10.0, 100.0, 0.00, "N", Date.valueOf("2024-01-02"))
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    val orders = Seq(1L).toDF("o_orderkey")
    val out = graft.operators.EtlOps.dqChecks(li, orders).as[(String, Double, Double, Boolean)].collect()
    assert(out.length == 6)
    assert(out.forall(r => r._2 == 1.0 && r._4), s"clean table must pass all: ${out.toSeq}")
  }

  test("q_dq_freshness: lag, missing days, and the 30-minute verdict are exact") {
    // Stale feed 'b': last event 45 min before the watermark, and it skips
    // a whole calendar day inside the observed range.
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-03 12:00:00"), 1L, "a", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "b", 1.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-03 11:15:00"), 1L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("dq_fresh").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = QueryRegistry
      .queries("q_dq_freshness")(spark, dir)
      .as[(String, Long, Timestamp, Long, Long, Boolean)]
      .collect()
      .toSeq
    // Feed a: 2 events over days {1,3} of a 3-day range -> 1 missing day;
    // it owns the watermark, so lag 0 and fresh.
    assert(out.find(_._1 == "a").get == (("a", 2L, Timestamp.valueOf("2024-01-03 12:00:00"), 0L, 1L, true)))
    // Feed b: 45 min stale -> not fresh; same 1-day gap.
    assert(out.find(_._1 == "b").get == (("b", 2L, Timestamp.valueOf("2024-01-03 11:15:00"), 45L, 1L, false)))
  }
}
