package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** §2.4 streaming over `events` (SURVEY.md).
  *
  * `q_stream_windowed_agg` runs a real Structured Streaming job (file
  * source → watermark → tumbling window → memory sink, Trigger.AvailableNow)
  * and returns the sink table — on bounded input the result equals the
  * batch aggregation, which is exactly what the DuckDB oracle computes.
  *
  * `q_stream_sessionize` is the batch-equivalent sessionization (gap > 30
  * min starts a new session); the stateful streaming variant lives in
  * graft.streaming.StreamingJobs with a spec asserting it matches this.
  */
object StreamQueries {
  import Tables._

  val all: Seq[Q] = Seq(
    Q(
      "q_stream_windowed_agg",
      (s, d) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = "wagg_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val agg = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            (sum(col("value").cast("decimal(25,10)")).cast("double") / count(lit(1)))
              .as("avg_value")
          )
          .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("avg_value"))
        val q = agg.writeStream
          .format("memory")
          .queryName(name)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
      },
      Some("""SELECT make_timestamp(CAST((epoch_us(ts) // 21600000000) * 21600000000 AS BIGINT)) AS window_start,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS avg_value
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),

    // Streaming stateful dedup: dropDuplicates over a keyed stream keeps
    // the first arrival per key in the state store (state is O(distinct
    // keys); with a watermark the store evicts — the unbounded-stream
    // deployment adds dropDuplicatesWithinWatermark). Only the key columns
    // are emitted: WHICH row wins per key is arrival-order-dependent in a
    // distributed stream, but the key SET is deterministic — exactly what
    // the DuckDB oracle checks.
    Q(
      "q_stream_dedup",
      (s, d) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = "sdedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .select(col("user_id"), col("event_type"))
          .dropDuplicates("user_id", "event_type")
          .writeStream
          .format("memory")
          .queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events""")
    ),

    Q(
      "q_stream_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        events(s, d)
          .withColumn("new_sess", when(gap.isNull || gap > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end")
          )
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end
             |FROM sess GROUP BY user_id, session_id""".stripMargin)
    )
  )
}
