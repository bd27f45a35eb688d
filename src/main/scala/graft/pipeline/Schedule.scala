package graft.pipeline

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** The reference deployment's `schedule_interval` + `catchup` semantics
  * (uscrn_dag.py:271-289 `schedule_interval='0 10 * * *', catchup=False`;
  * nws_dag.py:224-236 hourly) as a deterministic library seam.
  *
  * A query engine library should not own a daemon: the HOST (cron, Airflow,
  * k8s CronJob) decides when "now" happens. What the engine owes a
  * migrating user is (a) the cron arithmetic — which wall-clock ticks a
  * schedule produces, including the catchup/backfill decision — and (b) the
  * guarantee that firing the same tick twice cannot double-load (idempotent
  * [[graft.sources.StagingSink.mergeToMain]] merges; file-stream inputs use
  * `Trigger.AvailableNow` via [[graft.streaming.StreamingJobs.stagedLoad]],
  * which is exactly a scheduled batch: drain everything new, then stop).
  * [[Scheduler.runDue]] packages both: give it the last run tick and "now",
  * and it runs the pipeline once per due tick — every missed tick with
  * `catchup = true` (Airflow backfill), only the latest with `catchup =
  * false` (the reference's setting).
  *
  * Cron dialect: standard 5 fields (minute hour day-of-month month
  * day-of-week) with `*`, lists, ranges, and slash-step values, plus the
  * `@hourly` / `@daily` / `@weekly` / `@monthly` aliases. Day-of-month
  * and day-of-week combine Vixie-style: if BOTH are restricted, either may
  * match. All arithmetic is UTC, matching the reference DAGs.
  */
final case class CronExpr(
    minutes: Set[Int],
    hours: Set[Int],
    doms: Set[Int],
    months: Set[Int],
    dows: Set[Int],
    domRestricted: Boolean,
    dowRestricted: Boolean
) {

  def matches(t: ZonedDateTime): Boolean = {
    // Vixie day rule: OR of the two day fields only when BOTH are
    // explicitly restricted (no leading '*'); otherwise AND — a
    // star-with-step field ('*/2') still constrains through its value
    // set, it just doesn't trigger the OR.
    val domOk = doms(t.getDayOfMonth)
    val dowOk = dows(t.getDayOfWeek.getValue % 7)
    val dayOk = if (domRestricted && dowRestricted) domOk || dowOk else domOk && dowOk
    minutes(t.getMinute) && hours(t.getHour) && months(t.getMonthValue) && dayOk
  }

  /** First matching tick strictly after `t` (minute resolution; scans at
    * most ~4 years, far past any real cron's gap).
    */
  def nextAfter(t: Instant): Instant = {
    var z = t.atZone(ZoneOffset.UTC).withSecond(0).withNano(0).plusMinutes(1)
    val limit = z.plusYears(4)
    while (!matches(z)) {
      z = z.plusMinutes(1)
      if (!z.isBefore(limit)) throw new IllegalArgumentException(s"no tick within 4 years of $t")
    }
    z.toInstant
  }

  /** Latest matching tick at or before `t`, if any exists within 4 years —
    * the anchor a first-ever `runDue` needs so a weekly/monthly schedule
    * still fires regardless of when the host happens to invoke it.
    */
  def prevAtOrBefore(t: Instant): Option[Instant] = {
    var z = t.atZone(ZoneOffset.UTC).withSecond(0).withNano(0)
    val limit = z.minusYears(4)
    while (!matches(z)) {
      z = z.minusMinutes(1)
      if (z.isBefore(limit)) return None
    }
    Some(z.toInstant)
  }

  /** Every tick in `(afterExclusive, untilInclusive]`, oldest first. */
  def ticksBetween(afterExclusive: Instant, untilInclusive: Instant): Seq[Instant] = {
    val out = Seq.newBuilder[Instant]
    var t = afterExclusive
    var more = true
    while (more) {
      val n = nextAfter(t)
      if (n.isAfter(untilInclusive)) more = false
      else { out += n; t = n }
    }
    out.result()
  }
}

object CronExpr {

  private val aliases = Map(
    "@hourly"  -> "0 * * * *",
    "@daily"   -> "0 0 * * *",
    "@weekly"  -> "0 0 * * 0",
    "@monthly" -> "0 0 1 * *"
  )

  def parse(expr: String): CronExpr = {
    val s = aliases.getOrElse(expr.trim, expr.trim)
    val fields = s.split("\\s+")
    require(fields.length == 5, s"cron needs 5 fields, got '$expr'")
    def field(name: String, f: String, lo: Int, hi: Int): Set[Int] =
      f.split(",", -1).flatMap { part =>
        def bad(why: String): Nothing =
          throw new IllegalArgumentException(s"bad cron $name field '$part': $why")
        def num(v: String): Int =
          try v.toInt
          catch { case _: NumberFormatException => bad(s"'$v' is not a number") }
        // split with limit -1 keeps trailing empties, so '5/' and '*/'
        // fail loudly instead of silently parsing as step 1.
        val (body, step) = part.split("/", -1) match {
          case Array(b)     => (b, 1)
          case Array(b, st) => (b, num(st))
          case _            => bad("more than one '/'")
        }
        if (step < 1) bad("step must be >= 1")
        val hasStep = part.contains("/")
        val range = body match {
          case "*" => lo to hi
          case b if b.contains("-") =>
            b.split("-", -1) match {
              case Array(a, z) => num(a) to num(z)
              case _           => bad("malformed range")
            }
          // Vixie/Quartz: a single value WITH a step extends to the end of
          // the field's range ('30/10' over minutes = 30,40,50).
          case b if hasStep => num(b) to hi
          case b            => num(b) to num(b)
        }
        if (range.isEmpty || range.head < lo || range.last > hi)
          bad(s"value out of [$lo,$hi]")
        range.filter(v => (v - range.head) % step == 0)
      }.toSet
    val dows = field("day-of-week", fields(4), 0, 7).map(_ % 7) // 7 = Sunday = 0
    CronExpr(
      minutes = field("minute", fields(0), 0, 59),
      hours = field("hour", fields(1), 0, 23),
      doms = field("day-of-month", fields(2), 1, 31),
      months = field("month", fields(3), 1, 12),
      dows = dows,
      // Vixie semantics: a field is "restricted" for the dom/dow OR rule
      // only when it does not START with '*' ('*/2' counts as star).
      domRestricted = !fields(2).startsWith("*"),
      dowRestricted = !fields(4).startsWith("*")
    )
  }
}

object Scheduler {

  /** Run `pipeline` once per due tick of `cron` in `(lastRun, now]` —
    * every missed tick with `catchup = true` (backfill), only the most
    * recent with `catchup = false` (the reference DAGs' setting: a DAG
    * paused for a week runs once, not seven times). Returns (tick, run)
    * pairs oldest-first; the caller persists the last tick it saw. Safe to
    * re-invoke with an overlapping window: idempotent sinks make re-run
    * ticks no-ops, and [[Pipeline.run]]'s per-name lock serializes
    * overlapping invocations (Airflow's max_active_runs=1).
    */
  def runDue(
      pipeline: Pipeline,
      cron: CronExpr,
      lastRun: Option[Instant],
      now: Instant,
      catchup: Boolean = false
  ): Seq[(Instant, PipelineRun)] = {
    // First-ever invocation: the most recent past tick IS the due list —
    // a monthly schedule fires no matter when in the month the host first
    // calls (a fixed short lookback would silently never fire schedules
    // whose period exceeds it), and there is no unbounded backfill without
    // a recorded lastRun, even in catchup mode.
    val due = lastRun match {
      case Some(from) => cron.ticksBetween(from, now)
      case None       => cron.prevAtOrBefore(now).toSeq
    }
    val toRun = if (catchup) due else due.takeRight(1)
    toRun.map(t => t -> pipeline.run())
  }

  /** [[runDue]] against the cadence declared on the pipeline itself via
    * [[Pipeline.schedule]] — the host's loop needs only (pipeline,
    * lastRun, now).
    */
  def runDue(
      pipeline: Pipeline,
      lastRun: Option[Instant],
      now: Instant,
      catchup: Boolean
  ): Seq[(Instant, PipelineRun)] = {
    val cron = pipeline.cron.getOrElse(
      throw new IllegalStateException(s"pipeline '${pipeline.name}' declares no schedule")
    )
    runDue(pipeline, cron, lastRun, now, catchup)
  }
}
