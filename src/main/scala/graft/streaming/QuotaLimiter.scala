package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key ingestion quota on an unbounded stream — the streaming analogue
  * of the batch `cap_per_source` curation cap (at 100 TB/day a pipeline
  * caps what each tenant/source may contribute BEFORE it lands, not after):
  * each key emits at most `cap` events, ever; the overflow is dropped at
  * the stream operator, so the sink and everything downstream never see it.
  *
  * Built on the arbitrary-state v2 API (`transformWithState`, Spark 4):
  * one `ValueState[Long]` per key holds the quota already used — O(keys)
  * state of a single long, the smallest state footprint a per-key cap can
  * have, and the API binds to the RocksDB state-store provider so live
  * keys are disk-backed, not an executor-heap ceiling
  * ([[graft.Engine.useRocksDbStateStore]]). `TTLConfig.NONE` because a
  * lifetime quota never expires; a per-day cap is the same processor with
  * a day-keyed group and a TTL.
  *
  * Ordering contract: the quota is consumed in ARRIVAL order across
  * micro-batches (the only order an unbounded stream has), and in
  * (ts, event_id) order WITHIN each batch — selected by a bounded
  * min-heap of the remaining-quota size, O(rows · log cap) time and
  * O(cap) memory per key per batch, never a full buffer or sort. On a
  * bounded single-batch input the result is therefore exactly the batch
  * `row_number() OVER (PARTITION BY key ORDER BY ts, event_id) <= cap`,
  * which is what the DuckDB oracle states.
  */
object QuotaLimiter {

  case class QuotaEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class QuotaOut(event_id: Long, user_id: Long, value: Double)

  /** Microsecond instant of a Timestamp. Via Instant, whose epoch-second
    * is floored — a getTime/1000 division truncates toward zero, which
    * flips the sign of the sub-second part for pre-1970 instants and
    * would sort pre-epoch events AFTER post-epoch ones.
    */
  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  class QuotaProcessor(cap: Int) extends StatefulProcessor[Long, QuotaEvent, QuotaOut] {
    @transient private var used: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getValueState[Long]("used", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[QuotaEvent],
        timers: TimerValues
    ): Iterator[QuotaOut] = {
      val already = if (used.exists()) used.get() else 0L
      val remaining = math.max(0L, cap - already).toInt
      if (remaining == 0) Iterator.empty
      else {
        // Bounded top-K selection of this batch's first `remaining` rows in
        // (ts, event_id) order: a max-heap of size ≤ remaining — a later
        // row evicts the heap's largest when it sorts earlier.
        val ord: Ordering[QuotaEvent] = Ordering.by(e => (micros(e.ts), e.event_id))
        val heap = new scala.collection.mutable.PriorityQueue[QuotaEvent]()(ord)
        rows.foreach { e =>
          if (heap.size < remaining) heap.enqueue(e)
          else if (ord.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
        }
        val taken = heap.dequeueAll
        used.update(already + taken.size)
        taken.iterator.map(e => QuotaOut(e.event_id, e.user_id, e.value))
      }
    }
  }

  /** The capped stream: at most `cap` events per user_id, ever. */
  def limit(events: Dataset[QuotaEvent], cap: Int): Dataset[QuotaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(cap), TimeMode.None(), OutputMode.Append())
  }
}
