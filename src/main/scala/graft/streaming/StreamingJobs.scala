package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Stateful streaming jobs (SURVEY.md §2.4).
  *
  * [[sessionize]] is the `flatMapGroupsWithState` form of gap-based
  * sessionization (gap > `gapMinutes` starts a new session). The same
  * function runs in both execution modes:
  *
  *  - **batch**: Spark executes `flatMapGroupsWithState` per group within the
  *    single "batch epoch" — StreamingJobsSpec asserts the output is
  *    row-identical to the window-based batch formulation
  *    (`q_stream_sessionize`), which is itself DuckDB-oracled.
  *  - **streaming**: attach to `readStream` with a watermark and
  *    `GroupStateTimeout.EventTimeTimeout()`; state carries the open session
  *    across micro-batches and flushes it when the watermark passes the gap.
  *    (On bounded input the trailing open session is withheld until timeout —
  *    correct streaming semantics — which is why the spec pins the batch
  *    mode, where every session flushes.)
  *
  * State per key is one open session (4 longs), not the event list — the
  * state store stays O(active users), independent of history length.
  */
object StreamingJobs {

  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)

  case class OpenSession(
      session_id: Long,
      n_events: Long,
      start_us: Long,
      end_us: Long
  )

  case class SessionOut(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      session_start: Timestamp,
      session_end: Timestamp
  )

  /** Splits one user's (sorted) events into sessions, carrying at most one
    * open session in `state`. Batch mode delivers each group once with no
    * timeout, so the final session is flushed on the spot.
    */
  private def sessionizeGroup(gapUs: Long)(
      userId: Long,
      rows: Iterator[SessionEvent],
      state: GroupState[OpenSession]
  ): Iterator[SessionOut] = {
    def micros(t: Timestamp): Long = t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    def fromMicros(us: Long): Timestamp = Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    // Micro-batch iterators are not time-ordered; per-user sort is bounded
    // by that user's events in the batch (not global history).
    val evs = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
    var open = state.getOption.orNull
    val out = Seq.newBuilder[SessionOut]
    for (e <- evs) {
      val us = micros(e.ts)
      if (open == null) {
        open = OpenSession(1L, 1L, us, us)
      } else if (us - open.end_us > gapUs) {
        out += SessionOut(
          userId,
          open.session_id,
          open.n_events,
          fromMicros(open.start_us),
          fromMicros(open.end_us)
        )
        open = OpenSession(open.session_id + 1L, 1L, us, us)
      } else {
        open = open.copy(n_events = open.n_events + 1L, end_us = us)
      }
    }
    if (open != null) {
      // Batch mode: the group is complete — flush the trailing session.
      // (Streaming mode would instead state.update(open) and flush on
      // event-time timeout; see scaladoc.)
      out += SessionOut(
        userId,
        open.session_id,
        open.n_events,
        fromMicros(open.start_us),
        fromMicros(open.end_us)
      )
      state.remove()
    }
    out.result().iterator
  }

  /** The reference's staging→main load as a streaming job: each micro-batch
    * lands in staging and merges into main with audit timestamp +
    * business-key idempotency (`StagingSink.mergeToMain`). With
    * `Trigger.AvailableNow` this is the incremental-batch deployment shape
    * (run on a schedule, process only new files, stop); as a continuous
    * query it is the always-on shape — the code is identical. The
    * checkpoint gives exactly-once file tracking, and the key anti-join
    * makes replayed batches no-ops, so end-to-end the load is idempotent
    * even across checkpoint loss.
    */
  def stagedLoad(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stagingPath: String,
      mainPath: String,
      keyCols: Seq[String],
      checkpoint: String,
      clock: org.apache.spark.sql.Column
  ): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sources.StagingSink.stage(batch, stagingPath)
        graft.sources.StagingSink.mergeToMain(batch.sparkSession, stagingPath, mainPath, keyCols, clock)
      }
      .start()

  /** Gap-based sessionization with explicit per-user state. */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      )(sessionizeGroup(gapUs))
  }
}
