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
    val dayOk = (domRestricted, dowRestricted) match {
      case (true, true)   => doms(t.getDayOfMonth) || dows(t.getDayOfWeek.getValue % 7)
      case (true, false)  => doms(t.getDayOfMonth)
      case (false, true)  => dows(t.getDayOfWeek.getValue % 7)
      case (false, false) => true
    }
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
    def field(f: String, lo: Int, hi: Int): Set[Int] =
      f.split(",").flatMap { part =>
        val (body, step) = part.split("/") match {
          case Array(b)     => (b, 1)
          case Array(b, st) => (b, st.toInt)
          case _            => throw new IllegalArgumentException(s"bad cron field '$part'")
        }
        val range = body match {
          case "*" => lo to hi
          case b if b.contains("-") =>
            val Array(a, z) = b.split("-"); a.toInt to z.toInt
          case b => b.toInt to b.toInt
        }
        range.filter(v => (v - range.head) % step == 0)
      }.toSet
    val dows = field(fields(4), 0, 7).map(_ % 7) // 7 = Sunday = 0
    CronExpr(
      minutes = field(fields(0), 0, 59),
      hours = field(fields(1), 0, 23),
      doms = field(fields(2), 1, 31),
      months = field(fields(3), 1, 12),
      dows = dows,
      domRestricted = fields(2) != "*",
      dowRestricted = fields(4) != "*"
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
    val from = lastRun.getOrElse(now.atZone(ZoneOffset.UTC).minusDays(1).toInstant)
    val due = cron.ticksBetween(from, now)
    val toRun = if (catchup) due else due.takeRight(1)
    toRun.map(t => t -> pipeline.run())
  }
}
