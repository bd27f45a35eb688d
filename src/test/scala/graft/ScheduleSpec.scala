package graft

import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CronExpr, Pipeline, Scheduler}
import graft.sources.StagingSink

/** The reference's `schedule_interval`/`catchup` seam (uscrn_dag.py:271):
  * cron arithmetic is deterministic and UTC, catchup=False collapses missed
  * ticks to one run, and firing the same tick repeatedly cannot double-load
  * because the merge sink is idempotent.
  */
class ScheduleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def i(s: String): Instant = Instant.parse(s)

  test("cron arithmetic: daily-at-10 (the uscrn schedule), steps, aliases, weekday fields") {
    val daily10 = CronExpr.parse("0 10 * * *")
    assert(
      daily10.ticksBetween(i("2026-01-01T00:00:00Z"), i("2026-01-03T23:00:00Z")) ==
        Seq(i("2026-01-01T10:00:00Z"), i("2026-01-02T10:00:00Z"), i("2026-01-03T10:00:00Z"))
    )
    assert(CronExpr.parse("@hourly").ticksBetween(i("2026-01-01T00:30:00Z"), i("2026-01-01T03:30:00Z")) ==
      Seq(i("2026-01-01T01:00:00Z"), i("2026-01-01T02:00:00Z"), i("2026-01-01T03:00:00Z")))
    assert(CronExpr.parse("*/15 2 * * *").ticksBetween(i("2026-01-01T00:00:00Z"), i("2026-01-01T23:00:00Z")) ==
      Seq(i("2026-01-01T02:00:00Z"), i("2026-01-01T02:15:00Z"),
        i("2026-01-01T02:30:00Z"), i("2026-01-01T02:45:00Z")))
    // 2026-01-05 is a Monday; both 1 and the 7≡0 Sunday spelling work.
    assert(CronExpr.parse("0 0 * * 1").nextAfter(i("2026-01-01T00:00:00Z")) == i("2026-01-05T00:00:00Z"))
    assert(CronExpr.parse("0 0 * * 7").nextAfter(i("2026-01-01T00:00:00Z")) == i("2026-01-04T00:00:00Z"))
  }

  test("cron edge semantics: value/step extension, star-flag OR rule, parse validation, prev tick") {
    // Vixie: a single value with a step extends to the end of the range.
    assert(CronExpr.parse("30/10 2 * * *").ticksBetween(i("2026-01-01T00:00:00Z"), i("2026-01-01T23:00:00Z")) ==
      Seq(i("2026-01-01T02:30:00Z"), i("2026-01-01T02:40:00Z"), i("2026-01-01T02:50:00Z")))
    // dom '*/2' starts with '*' → unrestricted for the dom/dow OR rule:
    // '0 0 */2 * 1' fires only on Mondays that are odd days (AND), never
    // on a non-Monday odd day. Jan 2 2026 (odd, Friday) must NOT match;
    // Jan 5 (Monday, odd) must.
    val mixed = CronExpr.parse("0 0 */2 * 1")
    assert(mixed.nextAfter(i("2026-01-01T00:00:00Z")) == i("2026-01-05T00:00:00Z"))
    // Jan 12 2026 is a Monday on an EVEN day: the AND rule must skip it
    // and land on Jan 19 (odd Monday).
    assert(mixed.nextAfter(i("2026-01-11T00:00:00Z")) == i("2026-01-19T00:00:00Z"))
    // Both dom and dow explicitly restricted → Vixie OR: fires on day 15
    // OR on Mondays.
    val orRule = CronExpr.parse("0 0 15 * 1")
    assert(orRule.nextAfter(i("2026-01-01T00:00:00Z")) == i("2026-01-05T00:00:00Z"))
    assert(orRule.nextAfter(i("2026-01-12T00:00:00Z")) == i("2026-01-15T00:00:00Z"))
    // Out-of-range values fail at PARSE time with the field named, not
    // after a 4-year minute scan at schedule time.
    for (bad <- Seq("0 25 * * *", "61 * * * *", "0 0 0 * *", "0 0 * 13 *",
        "5/ * * * *", "*/ * * * *", "0 0 1- * *", "0 0 1-2-3 * *", "x * * * *", "0 */0 * * *"))
      assert(intercept[IllegalArgumentException](CronExpr.parse(bad)).getMessage.contains("cron"),
        s"'$bad' must fail loudly at parse time")
    // prevAtOrBefore finds the anchor tick for long-period schedules.
    assert(CronExpr.parse("@monthly").prevAtOrBefore(i("2026-03-15T12:00:00Z")) ==
      Some(i("2026-03-01T00:00:00Z")))
  }

  test("first-ever runDue fires long-period schedules regardless of invocation time") {
    var runs = 0
    val p = Pipeline("sched_monthly").step("inc") { runs += 1 }
    // lastRun = None mid-month: the most recent monthly tick (the 1st) is
    // due — a fixed short lookback would silently never fire this.
    val out = Scheduler.runDue(p, CronExpr.parse("@monthly"), None, i("2026-03-15T12:00:00Z"))
    assert(out.map(_._1) == Seq(i("2026-03-01T00:00:00Z")) && runs == 1)
    // And no unbounded backfill on first run even in catchup mode.
    val out2 = Scheduler.runDue(p, CronExpr.parse("@monthly"), None, i("2026-03-15T12:00:00Z"),
      catchup = true)
    assert(out2.size == 1 && runs == 2)
  }

  test("catchup=false runs the latest missed tick only; catchup=true backfills all") {
    var runs = 0
    val p = Pipeline("sched_count").step("inc") { runs += 1 }
    val cron = CronExpr.parse("0 10 * * *")
    // Paused for 5 days: the reference's catchup=False runs ONCE.
    val one = Scheduler.runDue(p, cron, Some(i("2026-01-01T10:00:00Z")), i("2026-01-06T12:00:00Z"))
    assert(one.map(_._1) == Seq(i("2026-01-06T10:00:00Z")) && runs == 1)
    // Backfill mode re-runs each missed day.
    val all = Scheduler.runDue(p, cron, Some(i("2026-01-01T10:00:00Z")), i("2026-01-06T12:00:00Z"),
      catchup = true)
    assert(all.map(_._1).size == 5 && runs == 6)
    // Nothing due → nothing runs.
    assert(Scheduler.runDue(p, cron, Some(i("2026-01-06T10:00:00Z")), i("2026-01-06T12:00:00Z")).isEmpty)
    assert(runs == 6)
  }

  test("scheduled re-runs stay idempotent through the staging merge") {
    val base = java.nio.file.Files.createTempDirectory("sched").toString
    val staging = s"$base/staging"
    val main = s"$base/main"
    val clock = lit("2026-01-01 00:00:00").cast("timestamp")
    // The same extract lands every tick (a source that went quiet): the
    // keyed merge must make tick 2..n no-ops — Airflow re-triggering a DAG
    // run must not duplicate rows in main.
    val p = Pipeline("sched_merge")
      .step("extract") {
        StagingSink.stage(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), staging)
      }
      .step("merge") {
        StagingSink.mergeToMain(spark, staging, main, Seq("id"), clock)
      }
    val cron = CronExpr.parse("@daily")
    val r1 = Scheduler.runDue(p, cron, Some(i("2026-01-01T00:00:00Z")), i("2026-01-02T01:00:00Z"))
    assert(r1.size == 1 && r1.head._2.succeeded)
    assert(spark.read.parquet(main).count() == 2)
    // Three more scheduled days of the same data — catchup backfill, so
    // the pipeline genuinely runs three more times.
    val r2 = Scheduler.runDue(p, cron, Some(i("2026-01-02T00:00:00Z")), i("2026-01-05T01:00:00Z"),
      catchup = true)
    assert(r2.size == 3 && r2.forall(_._2.succeeded))
    assert(spark.read.parquet(main).count() == 2, "re-run ticks must not double-load main")
  }
}
