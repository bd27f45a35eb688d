package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Pipeline, RunStatus}

/** DAG-run semantics under failure injection: retries recover transient
  * step failures, exhausted retries fail the run and halt the chain, a
  * failing preflight alerts-and-skips (reference check_connection), and
  * every failure path lands on the alert hook.
  */
class PipelineSpec extends AnyFunSuite {

  test("transient step failure is retried and the run succeeds") {
    var calls = 0
    val alerts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = Pipeline("t")
      .onAlert(alerts += _)
      .withRetries(3, backoffMs = 1L)
      .step("flaky") { calls += 1; if (calls < 3) sys.error("transient") }
      .step("after") { () }
      .run()
    assert(run.succeeded && calls == 3)
    assert(run.steps.map(s => (s.name, s.attempts, s.succeeded)) ==
      Seq(("flaky", 3, true), ("after", 1, true)))
    assert(alerts.count(_.contains("'flaky' attempt")) == 2, alerts)
  }

  test("exhausted retries fail the run and later steps do not execute") {
    var afterRan = false
    val run = Pipeline("t")
      .onAlert(_ => ())
      .withRetries(1, backoffMs = 1L)
      .step("doomed") { sys.error("hard failure") }
      .step("after") { afterRan = true }
      .run()
    run.status match {
      case RunStatus.Failed(step, e) =>
        assert(step == "doomed" && e.getMessage == "hard failure")
      case other => fail(s"expected Failed, got $other")
    }
    assert(!afterRan, "steps after a failed step must not run")
    assert(run.steps.map(_.name) == Seq("doomed"))
    assert(run.steps.head.attempts == 2, "1 retry = 2 attempts")
    assert(run.alerts.size == 2)
  }

  test("failing preflight alerts and skips the run without executing steps") {
    var stepRan = false
    val run = Pipeline("t")
      .onAlert(_ => ())
      .preflight("check_domain") { Left("source unreachable") }
      .step("extract") { stepRan = true }
      .run()
    assert(run.status == RunStatus.PreflightSkipped("check_domain", "source unreachable"))
    assert(!stepRan && run.steps.isEmpty)
    assert(run.alerts.exists(a => a.contains("check_domain") && a.contains("source unreachable")))
  }

  test("a throwing preflight skips (not fails) the run, like an unreachable domain") {
    val run = Pipeline("t")
      .onAlert(_ => ())
      .preflight("check_domain") { sys.error("connect timeout") }
      .step("extract") { fail("must not run") }
      .run()
    run.status match {
      case RunStatus.PreflightSkipped("check_domain", reason) =>
        assert(reason.contains("connect timeout"))
      case other => fail(s"expected PreflightSkipped, got $other")
    }
  }

  test("passing preflights fall through to the steps in order") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = Pipeline("t")
      .preflight("dns") { Right(()) }
      .preflight("warehouse") { Right(()) }
      .step("a") { order += "a" }
      .step("b") { order += "b" }
      .step("c") { order += "c" }
      .run()
    assert(run.succeeded && order.toSeq == Seq("a", "b", "c"))
    assert(run.alerts.isEmpty)
  }

  test("concurrent runs of the same pipeline NAME serialize (max_active_runs=1)") {
    // A scheduler rebuilds the chain each tick, so each thread constructs
    // its OWN Pipeline instance with the same name — the lock must be
    // per-name, not per-instance, for overlapping triggers to serialize.
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    var maxActive = 0
    def build() = Pipeline("serialize-me").step("s") {
      val a = active.incrementAndGet()
      maxActive = math.max(maxActive, a)
      Thread.sleep(50)
      active.decrementAndGet()
    }
    val threads = (1 to 2).map(_ => new Thread(() => { build().run(); () }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(maxActive == 1, s"runs overlapped: $maxActive active at once")
  }

  test("a throwing alert hook does not change the run outcome or eat retries") {
    var calls = 0
    val run = Pipeline("t")
      .onAlert(_ => sys.error("alert channel down"))
      .withRetries(3, backoffMs = 1L)
      .step("flaky") { calls += 1; if (calls < 3) sys.error("transient") }
      .run()
    assert(run.succeeded && calls == 3,
      "run must retry to success even when every alert delivery throws")
    assert(run.alerts.size == 2, "alerts are still recorded on the run")
  }
}
