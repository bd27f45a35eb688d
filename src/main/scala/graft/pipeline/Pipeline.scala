package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** Outcome of one [[Pipeline.run]]. `alerts` collects every message the
  * alert hook received (preflight failures, per-attempt step failures) so
  * callers — and tests injecting failures — can assert the alerting path.
  */
final case class PipelineRun(
    pipeline: String,
    status: RunStatus,
    steps: Seq[StepResult],
    alerts: Seq[String]
) {
  def succeeded: Boolean = status == RunStatus.Succeeded
}

sealed trait RunStatus
object RunStatus {
  /** Every step ran (possibly after retries). */
  case object Succeeded extends RunStatus
  /** A preflight check failed: the run was alerted and SKIPPED, not failed —
    * the reference's check_connection semantics (utils.py:27-42): an
    * unreachable source domain logs an alert and the DAG run does nothing,
    * leaving main untouched for the next scheduled attempt.
    */
  final case class PreflightSkipped(check: String, reason: String) extends RunStatus
  /** A step exhausted its retries; later steps did not run. */
  final case class Failed(step: String, error: Throwable) extends RunStatus
}

/** Per-step execution record: how many attempts it took and how long the
  * successful (or final failing) attempt chain ran.
  */
final case class StepResult(name: String, attempts: Int, durationMs: Long, succeeded: Boolean)

/** The reference deployment's DAG-run semantics (uscrn_dag.py:271-289,
  * nws_dag.py:224-239: a linear task chain with connection preflights,
  * default_args-style retries, logging/alerting, max_active_runs=1) as a
  * small library surface over Spark jobs.
  *
  * Design choices, deliberately:
  *
  *   - '''Steps pass data through storage, not memory.''' Each step reads
  *     its input from a table/path and writes its output to one (stage →
  *     merge → export), exactly like the reference's tasks hand off through
  *     GCS + BigQuery staging tables. That is what makes a step a RESUME
  *     point: a retry re-runs one step against durable input, and an
  *     idempotent sink (overwrite-mode staging, keyed [[graft.sources.StagingSink.mergeToMain]])
  *     makes the retry safe. A pipeline passing DataFrames between steps
  *     in memory would re-run the whole lineage on every retry and lose
  *     exactly-once merges on partial failure.
  *   - '''Linear chains only''' — both reference DAGs are `t1 >> t2 >> …`;
  *     a general DAG scheduler is the host orchestrator's job, not a query
  *     engine library's. Likewise `schedule_interval` stays with the host
  *     (cron / Airflow / `Trigger.AvailableNow` for the scheduled-batch
  *     shape — see [[graft.streaming.StreamingJobs.stagedLoad]]).
  *   - '''Alert-and-skip preflights''': a failing preflight (source domain
  *     or warehouse unreachable — [[graft.sources.WarehouseSink.checkConnection]]
  *     is the intended check) alerts and skips the run rather than failing
  *     it, matching check_domain / check_connection in the reference.
  *   - '''max_active_runs=1''': concurrent `run()` calls serialize on a
  *     JVM-wide per-NAME lock (not per instance — a scheduler naturally
  *     rebuilds the chain each tick), so two overlapping scheduled
  *     triggers of the same pipeline cannot interleave their merges.
  *
  * Builder-style; every combinator returns a new immutable Pipeline:
  * {{{
  * val run = Pipeline("uscrn")
  *   .preflight("check_domain") { WarehouseSink.checkConnection(url, props) }
  *   .withRetries(2, backoffMs = 100)
  *   .step("extract_transform") { ... }
  *   .step("merge_to_main")     { ... }
  *   .run()
  * }}}
  */
final class Pipeline private (
    val name: String,
    preflights: Vector[(String, () => Either[String, Unit])],
    steps: Vector[(String, () => Unit)],
    retries: Int,
    backoffMs: Long,
    alertHook: String => Unit,
    runLock: Object,
    val cron: Option[CronExpr] = None
) {

  private def copy(
      preflights: Vector[(String, () => Either[String, Unit])] = preflights,
      steps: Vector[(String, () => Unit)] = steps,
      retries: Int = retries,
      backoffMs: Long = backoffMs,
      alertHook: String => Unit = alertHook,
      cron: Option[CronExpr] = cron
  ): Pipeline = new Pipeline(name, preflights, steps, retries, backoffMs, alertHook, runLock, cron)

  /** Declare the pipeline's cadence — the reference DAG's
    * `schedule_interval` (uscrn_dag.py:271-289 `'0 10 * * *'`,
    * nws_dag.py:224-236 hourly) carried ON the pipeline object, so the
    * host invokes [[Scheduler.runDue]] without re-stating the cron.
    */
  def schedule(expr: String): Pipeline = copy(cron = Some(CronExpr.parse(expr)))

  /** Add a preflight check (reference check_domain): `Left(reason)` alerts
    * and skips the whole run.
    */
  def preflight(check: String)(f: => Either[String, Unit]): Pipeline =
    copy(preflights = preflights :+ (check, () => f))

  /** Append a step to the chain. */
  def step(stepName: String)(body: => Unit): Pipeline =
    copy(steps = steps :+ (stepName, () => body))

  /** Per-step retry policy with a fixed delay between attempts — the
    * reference's Airflow default_args `retries`/`retry_delay` (also a
    * constant delay).
    */
  def withRetries(n: Int, backoffMs: Long = 1000L): Pipeline =
    copy(retries = n, backoffMs = backoffMs)

  /** Install the alert channel (the reference's logger + Airflow email
    * alerting). Default: stderr. The hook receives preflight failures and
    * every failed step attempt. A THROWING hook cannot change a run's
    * outcome (a down alert channel must not mask the underlying failure
    * or eat remaining retries): its exception is swallowed to stderr and
    * the run proceeds exactly as if the alert had been delivered.
    */
  def onAlert(f: String => Unit): Pipeline = copy(alertHook = f)

  /** Execute the chain: preflights first (any Left ⇒ alert + skip), then
    * each step with up to `retries` retries; a step exhausting its retries
    * fails the run and later steps do not execute.
    */
  def run(): PipelineRun = runLock.synchronized {
    val alerts = ArrayBuffer.empty[String]
    def alert(msg: String): Unit = {
      alerts += msg
      try alertHook(msg)
      catch {
        // An interrupt delivered during alert delivery (run cancellation)
        // must keep its flag so the retry loop's sleep sees it.
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          System.err.println(s"[pipeline] alert hook interrupted for '$msg': $ie")
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[pipeline] alert hook failed for '$msg': $e")
      }
    }

    val failedCheck = preflights.iterator
      .map { case (check, f) =>
        val reason =
          try f().left.toOption
          catch { case e: Exception => Some(e.toString) }
        (check, reason)
      }
      .collectFirst { case (check, Some(reason)) => (check, reason) }

    failedCheck match {
      case Some((check, reason)) =>
        alert(s"[$name] preflight '$check' failed — skipping run: $reason")
        PipelineRun(name, RunStatus.PreflightSkipped(check, reason), Nil, alerts.toSeq)
      case None =>
        val results = ArrayBuffer.empty[StepResult]
        var failure: Option[RunStatus.Failed] = None
        val it = steps.iterator
        while (failure.isEmpty && it.hasNext) {
          val (stepName, body) = it.next()
          val t0 = System.nanoTime()
          var attempt = 0
          var done = false
          var aborted = false
          var lastError: Throwable = null
          while (!done && !aborted && attempt <= retries) {
            attempt += 1
            try { body(); done = true }
            catch {
              // Cancellation is not a retryable failure: restore the
              // interrupt flag and fail the run immediately.
              case ie: InterruptedException =>
                Thread.currentThread().interrupt()
                lastError = ie
                aborted = true
                alert(s"[$name] step '$stepName' interrupted on attempt $attempt")
              case e: Exception =>
                lastError = e
                alert(s"[$name] step '$stepName' attempt $attempt failed: ${e.getMessage}")
                // The backoff sleep is where a cancellation most often
                // lands (including one re-flagged by the alert hook above)
                // — it must fail the run like a body interrupt does, not
                // escape run() as an uncaught InterruptedException that
                // loses the recorded results and collected alerts.
                if (attempt <= retries) {
                  try Thread.sleep(backoffMs)
                  catch {
                    case ie: InterruptedException =>
                      Thread.currentThread().interrupt()
                      lastError = ie
                      aborted = true
                      alert(s"[$name] step '$stepName' interrupted during retry backoff")
                  }
                }
            }
          }
          val ms = (System.nanoTime() - t0) / 1000000L
          results += StepResult(stepName, attempt, ms, done)
          if (!done) failure = Some(RunStatus.Failed(stepName, lastError))
        }
        PipelineRun(name, failure.getOrElse(RunStatus.Succeeded), results.toSeq, alerts.toSeq)
    }
  }
}

object Pipeline {

  // One lock per pipeline NAME, JVM-wide: rebuilding the chain each
  // scheduled tick (the natural use of the builder) must still serialize
  // runs of the same pipeline. The canonical interned string is the lock
  // object — unlike a grow-only map, interned strings are GC-eligible, so
  // dynamically-stamped names (backfill-2026-08-12, …) don't accumulate
  // forever. The name is namespaced first so no unrelated code could be
  // synchronizing on the same interned literal.
  private def lockFor(name: String): Object = ("graft.pipeline.lock:" + name).intern()

  def apply(name: String): Pipeline =
    new Pipeline(
      name,
      Vector.empty,
      Vector.empty,
      retries = 0,
      backoffMs = 1000L,
      alertHook = m => System.err.println(s"[pipeline] $m"),
      runLock = lockFor(name)
    )
}
