package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** §2.4 streaming over `events` (SURVEY.md).
  *
  * `q_stream_windowed_agg` runs a real Structured Streaming job (file
  * source → watermark → tumbling window → foreachBatch parquet sink,
  * Trigger.AvailableNow) and reads the sink directory back — on bounded
  * input the result equals the batch aggregation, which is exactly what the
  * DuckDB oracle computes. foreachBatch keeps the write a distributed
  * parquet job (complete-mode result overwritten per micro-batch) instead
  * of materializing the result table in driver memory the way a memory
  * sink would — at scale the windowed-agg result is bounded by group
  * cardinality but the dedup result is O(distinct keys), so both queries
  * use file-backed sinks.
  *
  * `q_stream_sessionize` is the batch-equivalent sessionization (gap > 30
  * min starts a new session); the stateful streaming variant lives in
  * graft.streaming.StreamingJobs with a spec asserting it matches this.
  */
object StreamQueries {
  import Tables._

  /** Deterministic sink/checkpoint scratch dir per (prefix, dataset, JVM),
    * WIPED and recreated per build (EtlQueries.scratchDir): a fresh
    * createTempDirectory per invocation stranded two dirs of
    * checkpoint/state data per stream query per bench run — unbounded
    * /tmp growth. The base resolves through System.getProperty at call
    * time, so Bench's RAM-disk redirect actually reaches these dirs (the
    * JDK's no-arg createTempDirectory snapshots the original property at
    * VM startup and would ignore it).
    */
  private def tmpDir(prefix: String, d: String): String =
    EtlQueries.scratchDir(prefix, d)

  /** Builds and STARTS the q_stream_enrich stream: event stream joined to a
    * broadcast static nation dimension, rolled up per nation, complete-mode
    * foreachBatch overwrite into `out`. Factored out of the registry entry
    * so MultimodalStreamingSpec can assert BroadcastHashJoin on THIS
    * handle's lastExecution — the actual micro-batch plan — rather than on
    * a batch restatement of the same join (r12 advice).
    */
  private[graft] def startEnrichStream(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      out: String,
      ckpt: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val dim = s.read.parquet(s"$d/nation.parquet").select("n_nationkey", "n_name")
    val enriched = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .select(col("user_id"), col("value"))
      .withColumn("nkey", col("user_id") % 25)
      .join(broadcast(dim), col("nkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,10)")).cast("double").as("total_value")
      )
    enriched.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Input writer for [[startOuterJoinStream]]: the four join columns of
    * `events` plus ONE far-future `flush` sentinel row (event_id/user_id
    * −1, ts = max(ts) + 10 days). On a BOUNDED stream the watermark can
    * never pass the last real event's time, so an outer join would hold
    * its unmatched rows forever — the tail of the stream would be missing
    * from the result and it would NOT equal the batch left join. The
    * sentinel is the harness device that closes every window: it flows
    * through BOTH sides' watermarks (it matches only itself — the −1 ids
    * pair up and are filtered after the join) and forces the final
    * no-data micro-batch to evict and null-emit every unmatched click. A
    * continuous deployment needs no sentinel: live traffic advances the
    * watermark the same way.
    */
  private[graft] def writeOuterJoinInput(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      src: String
  ): Unit = {
    val evs = Tables.events(s, d).select("event_id", "user_id", "event_type", "ts")
    val maxTs = evs.agg(max(col("ts"))).head().getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)
    val sentinel = s.range(1).select(
      lit(-1L).as("event_id"),
      lit(-1L).as("user_id"),
      lit("flush").as("event_type"),
      lit(flushTs).as("ts"))
    evs.unionByName(sentinel).write.mode("overwrite").parquet(src)
  }

  /** Builds and STARTS the q_stream_join_outer stream: click → purchase
    * attribution as a stream-stream LEFT OUTER join — the deployment shape
    * where the UNMATCHED side is the product ("clicks that never purchased
    * within 1 h"). An unmatched click emits exactly once, with nulls, when
    * the joint watermark passes click_ts + 1 h (its last possible match
    * time) — before that the row sits in the state store because a
    * matching purchase could still arrive. Watermarks on both sides + the
    * event-time range bound state exactly as in the inner q_stream_join;
    * unlike the inner form, no-data micro-batches must stay ENABLED — the
    * watermark-advancing empty batch is what flushes the unmatched rows.
    * Factored out of the registry entry so the spec can drive the SAME
    * production stream through a two-phase arrival (early files → withheld;
    * flush file under the same checkpoint → emitted exactly once).
    */
  private[graft] def startOuterJoinStream(
      s: org.apache.spark.sql.SparkSession,
      src: String,
      out: String,
      ckpt: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = s.read.parquet(src).schema
    def base = s.readStream.schema(schema).parquet(src)
    val clicks = base
      .filter(col("event_type").isin("click", "flush"))
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = base
      .filter(col("event_type").isin("purchase", "flush"))
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks
      .join(
        purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer"
      )
      // NOTE: the sentinel is NOT filtered here. A post-join filter on
      // click_id ≠ −1 is a left-side-only predicate, and Catalyst pushes
      // it through the left-outer join BELOW the clicks-side
      // EventTimeWatermark (click_id is not the event-time column, so the
      // push is legal) — the sentinel then never reaches the clicks
      // watermark and the tail of the stream is withheld forever
      // (measured: the last 2 h of unmatched clicks went missing). The
      // sentinel pair (−1 ids, equal ts, matches only itself) rides
      // through the sink and callers drop it on the batch read-back.
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("click_ts"), col("purchase_ts"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  val all: Seq[Q] = Seq(
    Q(
      "q_stream_windowed_agg",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_wagg_out", d)
        val ckpt = tmpDir("graft_wagg_ckpt", d)
        val agg = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .transform(Tables.normalizeTs(_))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            (sum(col("value").cast("decimal(25,10)")).cast("double") / count(lit(1)))
              .as("avg_value")
          )
          .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("avg_value"))
        val q = agg.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            // Complete mode re-emits the full result each micro-batch;
            // overwrite keeps the sink dir equal to the latest full result.
            // The write is an executor-side parquet job — nothing collects
            // to the driver.
            batch.write.mode("overwrite").parquet(out)
          }
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
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
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_sdedup_out", d)
        val ckpt = tmpDir("graft_sdedup_ckpt", d)
        val q = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .select(col("user_id"), col("event_type"))
          .dropDuplicates("user_id", "event_type")
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events""")
    ),

    // The UNBOUNDED-stream form of the dedup above:
    // dropDuplicatesWithinWatermark caps the state store's lifetime per
    // key at the watermark delay — on an endless stream plain
    // dropDuplicates grows state forever (O(all keys ever seen)), while
    // the within-watermark form evicts a key once the event-time
    // watermark passes its arrival + delay, bounding state at O(keys per
    // delay window). That is the only deployable shape at 100 TB/day.
    // On this bounded one-batch input nothing evicts mid-run, so the
    // emitted key set equals DISTINCT — the same oracle as
    // q_stream_dedup, now gating the TTL operator's plumbing
    // (watermark column required in the stream, key-only projection
    // after).
    Q(
      "q_stream_dedup_ttl",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_sdedupttl_out", d)
        val ckpt = tmpDir("graft_sdedupttl_ckpt", d)
        val q = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .transform(Tables.normalizeTs(_))
          .select(col("user_id"), col("event_type"), col("ts"))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type"))
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events""")
    ),

    // Stream-stream inner join: click → purchase attribution within 1 h
    // per user. Watermarks on BOTH sides plus the event-time range in the
    // join condition are what let the state store evict matched/expired
    // rows — without them a stream-stream join buffers forever. On bounded
    // input the result equals the batch self-join, which is exactly the
    // DuckDB oracle. Append mode, file sink, no driver materialization.
    Q(
      "q_stream_join",
      (s, d) => {
        // Inner-join output is complete after the data batches; the extra
        // no-data micro-batch only advances the watermark to evict state —
        // hygiene an AvailableNow one-shot doesn't need, and worth a full
        // batch of latency here. A continuous deployment leaves this on
        // (restored below).
        val prevNoData = s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        // The try starts HERE, not at awaitTermination: a failure in the
        // schema read, scratch-dir setup, or stream start would otherwise
        // skip the finally and leak the disabled conf to every later
        // stateful query in the session (Verify/Bench catch and continue).
        try {
          val schema = s.read.parquet(s"$d/events.parquet").schema
          val out = tmpDir("graft_sjoin_out", d)
          val ckpt = tmpDir("graft_sjoin_ckpt", d)
          def src = s.readStream
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(d)
            .transform(Tables.normalizeTs(_))
          val clicks = src
            .filter(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
            .withWatermark("click_ts", "1 hour")
          val purchases = src
            .filter(col("event_type") === "purchase")
            .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("purchase_ts"))
            .withWatermark("purchase_ts", "1 hour")
          val q = clicks
            .join(
              purchases,
              col("user_id") === col("p_user") &&
                col("purchase_ts") >= col("click_ts") &&
                col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR")
            )
            .select(col("user_id"), col("click_id"), col("purchase_id"), col("click_ts"), col("purchase_ts"))
            .writeStream
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s.read.parquet(out)
        } finally s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |  c.ts AS click_ts, p.ts AS purchase_ts
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin)
    ),

    // Stream-stream LEFT OUTER join — abandonment attribution: EVERY click
    // emits, matched ones with their purchases (the inner result above),
    // unmatched ones exactly once with nulls when the watermark closes
    // their 1 h window. See startOuterJoinStream for the state/eviction
    // story and writeOuterJoinInput for why bounded input needs the flush
    // sentinel. On this input the result equals the batch LEFT JOIN with
    // the same range condition — the DuckDB oracle.
    Q(
      "q_stream_join_outer",
      (s, d) => {
        val src = tmpDir("graft_sjoinout_src", d)
        val out = tmpDir("graft_sjoinout_out", d)
        val ckpt = tmpDir("graft_sjoinout_ckpt", d)
        // The inner q_stream_join disables no-data micro-batches as
        // hygiene; the OUTER form requires them (they carry the
        // watermark-driven null emission) — pin enabled, restore after.
        val prevNoData = s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        try {
          writeOuterJoinInput(s, d, src)
          val q = startOuterJoinStream(s, src, out, ckpt)
          q.awaitTermination()
          // Drop the sentinel self-pair on the batch read-back (see
          // startOuterJoinStream for why it can't be filtered in-stream).
          s.read.parquet(out).filter(col("click_id") =!= lit(-1L))
        } finally s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |  c.ts AS click_ts, p.ts AS purchase_ts
             |FROM events c LEFT JOIN events p
             |  ON c.user_id = p.user_id
             | AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
             |WHERE c.event_type = 'click'""".stripMargin)
    ),

    // Stream-STATIC join — the online-enrichment/monitoring deployment
    // the inventory lacked: a live stream joins a broadcast batch table
    // (here: per-type z-score stats computed once from the warehouse,
    // decimal-exact like q_anomaly_zscore) and flags outliers as they
    // arrive. Stream-static inner joins are STATELESS — no watermark, no
    // state store; per micro-batch Spark just broadcasts the static side
    // — so the streaming cost is exactly the batch map cost. Append mode,
    // file sink; on bounded input the result equals the batch filter,
    // which is what the oracle computes.
    Q(
      "q_stream_anomaly",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_sanom_out", d)
        val ckpt = tmpDir("graft_sanom_ckpt", d)
        val stats = events(s, d)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(25,10)")).as("sx"),
            sum((col("value") * col("value")).cast("decimal(25,10)")).as("sxx")
          )
          .select(
            col("event_type"),
            (col("sx").cast("double") / col("n").cast("double")).as("mean"),
            // Same zero-variance guards as q_anomaly_zscore: greatest(·,0)
            // against cancellation-negative variance, NULLIF(sd,0) so a
            // constant type yields NULL z (filtered out) on both engines.
            sqrt(greatest(
              col("sxx").cast("double") / col("n").cast("double") -
                (col("sx").cast("double") / col("n").cast("double")) *
                (col("sx").cast("double") / col("n").cast("double")),
              lit(0.0)
            )).as("sd")
          )
        val q = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .select(col("event_id"), col("event_type"), col("value"))
          .join(broadcast(stats), Seq("event_type"))
          .filter(abs((col("value") - col("mean")) / nullif(col("sd"), lit(0.0))) > lit(3.0))
          .select(
            col("event_id"),
            col("event_type"),
            col("value"),
            round((col("value") - col("mean")) / nullif(col("sd"), lit(0.0)), 4).as("z")
          )
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      },
      Some("""WITH stats AS (
             |  SELECT event_type,
             |    CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean,
             |    sqrt(greatest(CAST(SUM(CAST(value * value AS DECIMAL(25,10))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |      - (CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             |      * (CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 0.0)) AS sd
             |  FROM events GROUP BY event_type)
             |SELECT event_id, e.event_type, value,
             |  round((value - mean) / NULLIF(sd, 0.0), 4) AS z
             |FROM events e JOIN stats USING (event_type)
             |WHERE abs((value - mean) / NULLIF(sd, 0.0)) > 3.0""".stripMargin)
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
    ),

    // Windowed streaming top-k (trending users per 6-hour window) — the
    // canonical streaming-analytics leaderboard. The STREAM side maintains
    // only the windowed per-user counts (state bounded by windows ×
    // users, watermark-evicted); the rank runs inside foreachBatch over
    // the aggregated result — group-cardinality-bounded, so the window
    // function costs O(result), never O(events). Complete mode restates
    // the full leaderboard per micro-batch on this bounded input
    // (AvailableNow); the unbounded deployment emits the same aggregate
    // in update mode and ranks downstream, or caps state with
    // dropDuplicatesWithinWatermark + per-window TTL. Deterministic
    // tie-break (count desc, user_id asc) keeps the top-5 set
    // hash-stable on both engines.
    Q(
      "q_stream_topk",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_stopk_out", d)
        val ckpt = tmpDir("graft_stopk_ckpt", d)
        val agg = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .transform(Tables.normalizeTs(_))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "6 hours"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("window_start"), col("user_id"), col("n"))
        val q = agg.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val w = Window.partitionBy(col("window_start")).orderBy(col("n").desc, col("user_id"))
            batch
              .withColumn("rank", row_number().over(w))
              .filter(col("rank") <= 5)
              .write
              .mode("overwrite")
              .parquet(out)
          }
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      },
      Some("""WITH c AS (
             |  SELECT make_timestamp(CAST((epoch_us(ts) // 21600000000) * 21600000000 AS BIGINT)) AS window_start,
             |    user_id, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT window_start, user_id, n, rank FROM (
             |  SELECT window_start, user_id, n,
             |    CAST(row_number() OVER (PARTITION BY window_start ORDER BY n DESC, user_id) AS INT) AS rank
             |  FROM c) r
             |WHERE rank <= 5""".stripMargin)
    ),

    // Per-user ingestion quota on the arbitrary-state v2 API
    // (transformWithState + ValueState, Spark 4) — the streaming analogue
    // of the batch cap_per_source curation cap: each user contributes at
    // most 5 events, EVER; overflow is dropped at the operator so nothing
    // downstream sees it. State is one long per key in the RocksDB
    // provider the API requires (disk-backed live keys — the 100 TB
    // deployment shape; the seam is scoped to this query's start and
    // restored after, per its flip-before-start contract). Quota order is
    // arrival across batches, (ts, event_id) within one — so on this
    // bounded single-batch input the emitted set is exactly the batch
    // row_number()-per-user prefix, which is the DuckDB oracle.
    Q(
      "q_stream_quota",
      (s, d) => {
        import s.implicits._
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_squota_out", d)
        val ckpt = tmpDir("graft_squota_ckpt", d)
        Engine.useRocksDbStateStore(s, enable = true)
        try {
          val capped = graft.streaming.QuotaLimiter.limit(
            s.readStream
              .schema(schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(d)
              .transform(Tables.normalizeTs(_))
              .select(col("event_id"), col("user_id"), col("ts"), col("value"))
              .as[graft.streaming.QuotaLimiter.QuotaEvent],
            cap = 5)
          val q = capped.writeStream
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally Engine.useRocksDbStateStore(s, enable = false)
        s.read.parquet(out).orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value FROM (
             |  SELECT event_id, user_id, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events) t
             |WHERE rn <= 5 ORDER BY event_id""".stripMargin)
    ),

    // Stream-static enrichment — the one standard streaming join shape the
    // stream-stream q_stream_join doesn't cover: a live event stream
    // joined against a slowly-changing DIMENSION (here nation via
    // user_id % 25, the wbanno×locations analogue of the reference's
    // uscrn join re-expressed on the stream). The static side is a plain
    // batch DataFrame BROADCAST into every micro-batch — no state store,
    // no watermark requirement on the dimension, re-resolved per batch
    // (which is exactly how a dimension refresh reaches a 100 TB/day
    // stream without restarting it). The rolled-up per-nation totals are
    // group-cardinality-bounded, so complete mode + foreachBatch
    // overwrite keeps the sink equal to the latest full result; on
    // AvailableNow bounded input that equals the batch join-aggregate the
    // oracle states. Decimal-accumulated sum (the dsum rule) keeps the
    // double bit-identical across engines and micro-batch partitionings.
    Q(
      "q_stream_enrich",
      (s, d) => {
        val out = tmpDir("graft_senrich_out", d)
        val ckpt = tmpDir("graft_senrich_ckpt", d)
        val q = startEnrichStream(s, d, out, ckpt)
        q.awaitTermination()
        s.read.parquet(out).orderBy("n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS total_value
             |FROM events JOIN nation ON (user_id % 25) = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)
    ),

    // Streaming drift monitor — q_drift_psi deployed the way a monitoring
    // stack actually wants it: PSI computed ON ARRIVAL per micro-batch
    // instead of at batch close (the r14 verdict's item 3). The reference
    // artifact (median split point + per-type decile cuts fitted on the
    // reference half, cuts rounded 6 dp — identical discipline to
    // q_drift_psi) is computed ONCE batch-side: the split point ships as a
    // plan literal (one bounded driver value — in deployment the fitted
    // reference is exactly such a small offline artifact shipped to the
    // stream) and the cut arrays ride a stream-static BROADCAST join (the
    // q_stream_anomaly shape — stateless, no state store for the join).
    // The stream keeps only the (type, bin) counts as streaming state —
    // K×10-bounded regardless of event volume — and foreachBatch restates
    // the PSI report per micro-batch from those bounded counts joined to
    // the batch-precomputed reference bins (domain-filled, add-half
    // smoothed, 1e-12 fixed-point term sums — order-free, so the report
    // is deterministic across micro-batch partitionings). On AvailableNow
    // bounded input the final report equals q_drift_psi exactly, which is
    // what the oracle states and MultimodalStreamingSpec pins
    // structurally (batch ≡ stream — the q_stream_enrich pattern).
    Q(
      "q_stream_drift",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_sdrift_out", d)
        val ckpt = tmpDir("graft_sdrift_ckpt", d)
        val ev = events(s, d)
          .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
        val med = ev.agg(expr("percentile(us, 0.5)")).head().getDouble(0)
        val refHalf = ev.filter(col("us") <= med)
        val cuts = refHalf
          .groupBy("event_type")
          .agg(transform(
            expr("percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"),
            c => round(c, 6)).as("cuts"))
        val refBins = refHalf
          .join(broadcast(cuts), Seq("event_type"))
          .withColumn("bin", size(filter(col("cuts"), c => c <= col("value"))))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("c_ref"))
        val domain = cuts
          .select("event_type")
          .crossJoin(s.range(10).select(col("id").cast("int").as("bin")))
        val curCounts = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .transform(Tables.normalizeTs(_))
          .filter(unix_micros(col("ts")) > med)
          .select(col("event_type"), col("value"))
          .join(broadcast(cuts), Seq("event_type"))
          .withColumn("bin", size(filter(col("cuts"), c => c <= col("value"))))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("c_cur"))
        val q = curCounts.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val full = domain
              .join(refBins, Seq("event_type", "bin"), "left")
              .join(batch, Seq("event_type", "bin"), "left")
              .select(
                col("event_type"),
                col("bin"),
                coalesce(col("c_ref"), lit(0L)).as("c_ref"),
                coalesce(col("c_cur"), lit(0L)).as("c_cur"))
            val totals = full
              .groupBy("event_type")
              .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
            val p = (col("c_ref").cast("double") + lit(0.5)) /
              (col("n_ref").cast("double") + lit(5.0))
            val qq = (col("c_cur").cast("double") + lit(0.5)) /
              (col("n_cur").cast("double") + lit(5.0))
            full
              .join(broadcast(totals), Seq("event_type"))
              .withColumn("term_fp", round((p - qq) * log(p / qq) * lit(1.0e12), 0).cast("long"))
              .groupBy("event_type")
              .agg(
                max(col("n_ref")).as("n_ref"),
                max(col("n_cur")).as("n_cur"),
                sum(col("term_fp")).as("psi_fp"))
              .select(
                col("event_type"),
                col("n_ref"),
                col("n_cur"),
                round(col("psi_fp").cast("double") / lit(1.0e12), 6).as("psi"),
                (col("psi_fp") > lit(200000000000L)).as("drift_alert"))
              .write
              .mode("overwrite")
              .parquet(out)
          }
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out).orderBy("event_type")
      },
      // The stream must converge to exactly the batch monitor's report —
      // the oracle is q_drift_psi's, verbatim.
      Some("""WITH ev AS (
             |  SELECT event_type, value, epoch_us(ts) AS us FROM events),
             |med AS (SELECT quantile_cont(us, 0.5) AS med FROM ev),
             |half AS (
             |  SELECT event_type, value, us <= (SELECT med FROM med) AS is_ref FROM ev),
             |cuts AS (
             |  SELECT event_type,
             |    list_transform(
             |      quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             |      x -> round(x, 6)) AS cuts
             |  FROM half WHERE is_ref GROUP BY 1),
             |counts AS (
             |  SELECT h.event_type,
             |    CAST(len(list_filter(c.cuts, x -> x <= h.value)) AS INT) AS bin,
             |    CAST(SUM(CASE WHEN h.is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
             |    CAST(SUM(CASE WHEN h.is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
             |  FROM half h JOIN cuts c USING (event_type)
             |  GROUP BY 1, 2),
             |domain AS (
             |  SELECT c.event_type, CAST(r.range AS INT) AS bin FROM cuts c, range(10) r),
             |filled AS (
             |  SELECT d.event_type, d.bin,
             |    COALESCE(c.c_ref, 0) AS c_ref, COALESCE(c.c_cur, 0) AS c_cur
             |  FROM domain d LEFT JOIN counts c USING (event_type, bin)),
             |totals AS (
             |  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
             |    CAST(SUM(c_cur) AS BIGINT) AS n_cur
             |  FROM filled GROUP BY 1),
             |terms AS (
             |  SELECT f.event_type, t.n_ref, t.n_cur,
             |    CAST(round(
             |      ((CAST(f.c_ref AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0)
             |       - (CAST(f.c_cur AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0))
             |      * ln(((CAST(f.c_ref AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0))
             |           / ((CAST(f.c_cur AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0)))
             |      * 1.0e12) AS BIGINT) AS term_fp
             |  FROM filled f JOIN totals t USING (event_type))
             |SELECT event_type, n_ref, n_cur,
             |  round(CAST(CAST(SUM(term_fp) AS BIGINT) AS DOUBLE) / 1.0e12, 6) AS psi,
             |  CAST(SUM(term_fp) AS BIGINT) > 200000000000 AS drift_alert
             |FROM terms GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin)
    ),

    // Streaming KS next to streaming PSI, from ONE state store (the r15
    // verdict's item 3): the (type, bin) counts q_stream_drift already
    // keeps as its K×10-bounded streaming state are exactly the sufficient
    // statistic for the BINNED two-sample KS (q_drift_ks_approx's grid —
    // the empirical CDFs evaluated at the reference decile boundaries), so
    // the two drift reports a monitoring stack ships side by side come out
    // of the SAME streaming aggregation: one readStream, one stateful
    // groupBy, one foreachBatch that restates PSI (identical fixed-point
    // machinery to q_stream_drift) and the binned KS (cumulative bin sums
    // over the 10-bin domain — a window over K×10 rows, bounded at any
    // volume) from the same domain-filled counts. Determinism: PSI rides
    // the 1e-12 fixed-point term SUM (order-free), KS rides an order-free
    // MAX of diffs derived through the same double expression tree both
    // engines state — no extra machinery. The binned KS evaluates on a
    // SUBSET of the exact statistic's evaluation points, so binned ≤
    // q_drift_ks's exact D is a theorem the spec asserts batch-side.
    Q(
      "q_stream_drift_ks",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_sdks_out", d)
        val ckpt = tmpDir("graft_sdks_ckpt", d)
        val ev = events(s, d)
          .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
        val med = ev.agg(expr("percentile(us, 0.5)")).head().getDouble(0)
        val refHalf = ev.filter(col("us") <= med)
        val cuts = refHalf
          .groupBy("event_type")
          .agg(transform(
            expr("percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"),
            c => round(c, 6)).as("cuts"))
        val refBins = refHalf
          .join(broadcast(cuts), Seq("event_type"))
          .withColumn("bin", size(filter(col("cuts"), c => c <= col("value"))))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("c_ref"))
        val domain = cuts
          .select("event_type")
          .crossJoin(s.range(10).select(col("id").cast("int").as("bin")))
        val curCounts = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .transform(Tables.normalizeTs(_))
          .filter(unix_micros(col("ts")) > med)
          .select(col("event_type"), col("value"))
          .join(broadcast(cuts), Seq("event_type"))
          .withColumn("bin", size(filter(col("cuts"), c => c <= col("value"))))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("c_cur"))
        val q = curCounts.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val full = domain
              .join(refBins, Seq("event_type", "bin"), "left")
              .join(batch, Seq("event_type", "bin"), "left")
              .select(
                col("event_type"),
                col("bin"),
                coalesce(col("c_ref"), lit(0L)).as("c_ref"),
                coalesce(col("c_cur"), lit(0L)).as("c_cur"))
            val totals = full
              .groupBy("event_type")
              .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
            val p = (col("c_ref").cast("double") + lit(0.5)) /
              (col("n_ref").cast("double") + lit(5.0))
            val qq = (col("c_cur").cast("double") + lit(0.5)) /
              (col("n_cur").cast("double") + lit(5.0))
            val wb = Window
              .partitionBy(col("event_type"))
              .orderBy(col("bin"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            val bd = abs(
              sum(col("c_ref")).over(wb).cast("double") / col("n_ref").cast("double") -
                sum(col("c_cur")).over(wb).cast("double") / col("n_cur").cast("double"))
            full
              .join(broadcast(totals), Seq("event_type"))
              .withColumn("term_fp", round((p - qq) * log(p / qq) * lit(1.0e12), 0).cast("long"))
              .withColumn("bd", bd)
              .groupBy("event_type")
              .agg(
                max(col("n_ref")).as("n_ref"),
                max(col("n_cur")).as("n_cur"),
                sum(col("term_fp")).as("psi_fp"),
                max(col("bd")).as("ks_raw"))
              .select(
                col("event_type"),
                col("n_ref"),
                col("n_cur"),
                round(col("psi_fp").cast("double") / lit(1.0e12), 6).as("psi"),
                (col("psi_fp") > lit(200000000000L)).as("psi_alert"),
                round(col("ks_raw"), 6).as("ks_binned"),
                (col("ks_raw") > lit(1.358) *
                  sqrt((col("n_ref") + col("n_cur")).cast("double") /
                    (col("n_ref") * col("n_cur")).cast("double"))).as("ks_alert"))
              .write
              .mode("overwrite")
              .parquet(out)
          }
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out).orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, value, epoch_us(ts) AS us FROM events),
             |med AS (SELECT quantile_cont(us, 0.5) AS med FROM ev),
             |half AS (
             |  SELECT event_type, value, us <= (SELECT med FROM med) AS is_ref FROM ev),
             |cuts AS (
             |  SELECT event_type,
             |    list_transform(
             |      quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             |      x -> round(x, 6)) AS cuts
             |  FROM half WHERE is_ref GROUP BY 1),
             |counts AS (
             |  SELECT h.event_type,
             |    CAST(len(list_filter(c.cuts, x -> x <= h.value)) AS INT) AS bin,
             |    CAST(SUM(CASE WHEN h.is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
             |    CAST(SUM(CASE WHEN h.is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
             |  FROM half h JOIN cuts c USING (event_type)
             |  GROUP BY 1, 2),
             |domain AS (
             |  SELECT c.event_type, CAST(r.range AS INT) AS bin FROM cuts c, range(10) r),
             |filled AS (
             |  SELECT d.event_type, d.bin,
             |    COALESCE(c.c_ref, 0) AS c_ref, COALESCE(c.c_cur, 0) AS c_cur
             |  FROM domain d LEFT JOIN counts c USING (event_type, bin)),
             |totals AS (
             |  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
             |    CAST(SUM(c_cur) AS BIGINT) AS n_cur
             |  FROM filled GROUP BY 1),
             |terms AS (
             |  SELECT f.event_type, t.n_ref, t.n_cur,
             |    CAST(round(
             |      ((CAST(f.c_ref AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0)
             |       - (CAST(f.c_cur AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0))
             |      * ln(((CAST(f.c_ref AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0))
             |           / ((CAST(f.c_cur AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0)))
             |      * 1.0e12) AS BIGINT) AS term_fp,
             |    abs(CAST(SUM(f.c_ref) OVER (PARTITION BY f.event_type ORDER BY f.bin
             |               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(t.n_ref AS DOUBLE)
             |      - CAST(SUM(f.c_cur) OVER (PARTITION BY f.event_type ORDER BY f.bin
             |               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(t.n_cur AS DOUBLE)) AS bd
             |  FROM filled f JOIN totals t USING (event_type))
             |SELECT event_type, n_ref, n_cur,
             |  round(CAST(CAST(SUM(term_fp) AS BIGINT) AS DOUBLE) / 1.0e12, 6) AS psi,
             |  CAST(SUM(term_fp) AS BIGINT) > 200000000000 AS psi_alert,
             |  round(MAX(bd), 6) AS ks_binned,
             |  MAX(bd) > 1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE)
             |                         / CAST(n_ref * n_cur AS DOUBLE)) AS ks_alert
             |FROM terms GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin)
    ),

    // Streaming χ² — the drift family's third monitor deployed (with
    // q_stream_drift's PSI and q_stream_drift_ks's binned KS the trio a
    // monitoring stack ships is complete BOTH ways: three statistics ×
    // batch+stream): the categorical homogeneity test needs only
    // per-TYPE counts, so the streaming state is K-bounded — even
    // smaller than the PSI/KS pair's K×10 — and the reference half's
    // counts broadcast as the offline artifact. foreachBatch restates
    // q_drift_chi2's machinery verbatim: expected counts through the
    // identical double tree, 1e-9 fixed-point order-free term sums, the
    // literal df 1..9 critical table compared in fixed-point integers.
    // On bounded input the report equals the batch monitor exactly —
    // the oracle is q_drift_chi2's, verbatim.
    Q(
      "q_stream_chi2",
      (s, d) => {
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val out = tmpDir("graft_schi2_out", d)
        val ckpt = tmpDir("graft_schi2_ckpt", d)
        val ev = events(s, d)
          .select(col("event_type"), unix_micros(col("ts")).as("us"))
        val med = ev.agg(expr("percentile(us, 0.5)")).head().getDouble(0)
        val refCounts = ev
          .filter(col("us") <= med)
          .groupBy("event_type")
          .agg(count(lit(1)).as("c_ref"))
        val curCounts = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .transform(Tables.normalizeTs(_))
          .filter(unix_micros(col("ts")) > med)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("c_cur"))
        val q = curCounts.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val counts = refCounts
              .join(batch, Seq("event_type"), "full_outer")
              .select(
                col("event_type"),
                coalesce(col("c_ref"), lit(0L)).as("c_ref"),
                coalesce(col("c_cur"), lit(0L)).as("c_cur"))
            val totals = counts.agg(
              sum(col("c_ref")).as("t_ref"),
              sum(col("c_cur")).as("t_cur"),
              count(lit(1)).as("k"))
            val crD = col("c_ref").cast("double")
            val ccD = col("c_cur").cast("double")
            val ni = (col("c_ref") + col("c_cur")).cast("double")
            val nTot = (col("t_ref") + col("t_cur")).cast("double")
            val eRef = ni * col("t_ref").cast("double") / nTot
            val eCur = ni * col("t_cur").cast("double") / nTot
            val term = (crD - eRef) * (crD - eRef) / eRef + (ccD - eCur) * (ccD - eCur) / eCur
            val critFp = when(col("df") === 1, 3841458821L)
              .when(col("df") === 2, 5991464547L)
              .when(col("df") === 3, 7814727903L)
              .when(col("df") === 4, 9487729037L)
              .when(col("df") === 5, 11070497694L)
              .when(col("df") === 6, 12591587244L)
              .when(col("df") === 7, 14067140449L)
              .when(col("df") === 8, 15507313056L)
              .when(col("df") === 9, 16918977605L)
            counts
              .crossJoin(broadcast(totals))
              .select(
                col("t_ref"), col("t_cur"), col("k"),
                round(term * lit(1.0e9), 0).cast("long").as("term_fp"))
              .groupBy()
              .agg(
                max(col("t_ref")).as("n_ref"),
                max(col("t_cur")).as("n_cur"),
                max(col("k")).as("k"),
                sum(col("term_fp")).as("chi2_fp"))
              .withColumn("df", col("k") - 1)
              .select(
                col("n_ref"), col("n_cur"), col("k"), col("df"),
                // Zero-expected guard, restated verbatim from q_drift_chi2:
                // a degenerate median split (an empty half) must fail
                // loudly on both engines, not diverge through NaN casts.
                when(col("n_ref") > 0 && col("n_cur") > 0,
                  round(col("chi2_fp").cast("double") / lit(1.0e9), 6))
                  .otherwise(raise_error(lit("chi2: degenerate median split (an empty half)")))
                  .as("chi2"),
                (col("chi2_fp") > critFp).as("drift_alert"))
              .write.mode("overwrite").parquet(out)
          }
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      },
      // Convergence: the oracle is q_drift_chi2's, verbatim.
      Some("""WITH ev AS (
             |  SELECT event_type, epoch_us(ts) AS us FROM events),
             |med AS (SELECT quantile_cont(us, 0.5) AS med FROM ev),
             |counts AS (
             |  SELECT event_type,
             |    CAST(SUM(CASE WHEN us <= (SELECT med FROM med) THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
             |    CAST(SUM(CASE WHEN us > (SELECT med FROM med) THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
             |  FROM ev GROUP BY 1),
             |totals AS (
             |  SELECT CAST(SUM(c_ref) AS BIGINT) AS t_ref,
             |    CAST(SUM(c_cur) AS BIGINT) AS t_cur,
             |    CAST(COUNT(*) AS BIGINT) AS k
             |  FROM counts),
             |terms AS (
             |  SELECT t_ref, t_cur, k,
             |    CAST(round((
             |      (CAST(c_ref AS DOUBLE)
             |        - CAST(c_ref + c_cur AS DOUBLE) * CAST(t_ref AS DOUBLE) / CAST(t_ref + t_cur AS DOUBLE))
             |      * (CAST(c_ref AS DOUBLE)
             |        - CAST(c_ref + c_cur AS DOUBLE) * CAST(t_ref AS DOUBLE) / CAST(t_ref + t_cur AS DOUBLE))
             |      / (CAST(c_ref + c_cur AS DOUBLE) * CAST(t_ref AS DOUBLE) / CAST(t_ref + t_cur AS DOUBLE))
             |      + (CAST(c_cur AS DOUBLE)
             |        - CAST(c_ref + c_cur AS DOUBLE) * CAST(t_cur AS DOUBLE) / CAST(t_ref + t_cur AS DOUBLE))
             |      * (CAST(c_cur AS DOUBLE)
             |        - CAST(c_ref + c_cur AS DOUBLE) * CAST(t_cur AS DOUBLE) / CAST(t_ref + t_cur AS DOUBLE))
             |      / (CAST(c_ref + c_cur AS DOUBLE) * CAST(t_cur AS DOUBLE) / CAST(t_ref + t_cur AS DOUBLE))
             |    ) * 1.0e9) AS BIGINT) AS term_fp
             |  FROM counts, totals),
             |agg AS (
             |  SELECT MAX(t_ref) AS n_ref, MAX(t_cur) AS n_cur, MAX(k) AS k,
             |    CAST(SUM(term_fp) AS BIGINT) AS chi2_fp
             |  FROM terms)
             |SELECT n_ref, n_cur, k, k - 1 AS df,
             |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN round(CAST(chi2_fp AS DOUBLE) / 1.0e9, 6)
             |    ELSE error('chi2: degenerate median split (an empty half)') END AS chi2,
             |  chi2_fp > CASE k - 1
             |    WHEN 1 THEN 3841458821 WHEN 2 THEN 5991464547 WHEN 3 THEN 7814727903
             |    WHEN 4 THEN 9487729037 WHEN 5 THEN 11070497694 WHEN 6 THEN 12591587244
             |    WHEN 7 THEN 14067140449 WHEN 8 THEN 15507313056 WHEN 9 THEN 16918977605
             |    END AS drift_alert
             |FROM agg""".stripMargin)
    ),

    // The reference DAG as a STREAMING pipeline (r16 — q_uscrn_e2e proves
    // the batch chain composes; this row proves its INCREMENTAL
    // deployment converges to the identical end state, which is how the
    // reference actually runs: a cron-triggered DAG ingesting each new
    // scrape file into the warehouse, uscrn_dag.py:271-289): the text
    // extract arrives as a FOUR-file stream ordered by event_id (range
    // files with pinned mtimes — scrape batches land in capture order),
    // and each micro-batch runs the WHOLE per-batch DAG: parse the text
    // lines, broadcast-join the station dim, convert units behind the
    // sentinel guard, dedup IN BATCH on the composite key (min event_id),
    // then staging→MERGE into main keyed on the SAME composite key —
    // insert-if-absent, so with ascending arrival the global min-id
    // winner materializes incrementally without ever rescanning main's
    // history. The oracle is q_uscrn_e2e's restatement VERBATIM: four
    // incremental merges must converge to exactly the one-shot batch
    // chain's table (the q_stream_cdc convergence device applied to the
    // whole reference DAG). Scale shape: per-micro-batch cost is bounded
    // by the batch (parse map + broadcast join + in-batch window + a
    // key-only merge probe) — the incremental property the reference's
    // daily schedule depends on.
    Q(
      "q_stream_uscrn",
      (s, d) => {
        val base = tmpDir("graft_stream_uscrn", d)
        val src = s"$base/src"
        val main = s"$base/main"
        val ckpt = s"$base/ckpt"
        val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
        // Same null/empty-field guard as q_uscrn_e2e: concat_ws silently
        // skips nulls, shifting fields — fail loudly by name instead.
        def reqField(c: org.apache.spark.sql.Column, n: String) =
          when(c.isNull || c.cast("string") === "",
            raise_error(lit(s"q_stream_uscrn: null/empty $n cannot round-trip a whitespace-joined line")))
            .otherwise(c.cast("string"))
        val line = concat_ws(" ",
          reqField(col("event_id"), "event_id"), reqField(col("user_id"), "user_id"),
          reqField(col("event_type"), "event_type"), reqField(col("value"), "value"))
        events(s, d)
          .select(col("event_id"), line.as("line"))
          .repartitionByRange(4, col("event_id"))
          .write.mode("overwrite").parquet(src)
        // Pin arrival order = event_id order: range part files sort by
        // name in range order; give them strictly ascending mtimes so the
        // file source's (mtime, path) listing cannot reorder them.
        new java.io.File(src).listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .zipWithIndex.foreach { case (f, i) =>
            // Arrival order IS the contract here — a filesystem that
            // cannot pin mtimes must fail with a named cause, not surface
            // later as an inscrutable hash mismatch.
            require(f.setLastModified(1000000L * (i + 1)),
              s"setLastModified unsupported on ${f.getPath}: cannot pin micro-batch arrival order")
          }
        val dim = nation(s, d).select(col("n_nationkey"), col("n_name").as("station"))
        val schema = s.read.parquet(src).schema
        val q = s.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
          .select(col("line"))
          .writeStream
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val parsed = b
              .select(split(col("line"), "\\s+").as("f"))
              .select(
                element_at(col("f"), 1).cast("long").as("event_id"),
                element_at(col("f"), 2).cast("long").as("user_id"),
                element_at(col("f"), 3).as("event_type"),
                element_at(col("f"), 4).cast("double").as("value"))
            val transformed = graft.operators.EtlOps.dedupByKey(
              parsed
                .join(broadcast(dim), col("user_id") % 25 === col("n_nationkey"))
                .drop("n_nationkey")
                .withColumn("value_f", graft.operators.EtlOps.celsiusToFahrenheit(col("value"))),
              Seq("user_id", "event_type"),
              "event_id")
            val stg = s"$base/stg_$id"
            graft.sources.StagingSink.stage(transformed, stg)
            graft.sources.StagingSink
              .mergeToMain(s, stg, main, Seq("user_id", "event_type"), clock = t0)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(main)
          .select("event_id", "user_id", "station", "event_type", "value", "value_f",
            "date_added_utc")
          .orderBy("event_id")
      },
      // Convergence: the oracle is q_uscrn_e2e's restatement verbatim —
      // four incremental merges must land on the one-shot batch table.
      Some("""WITH parsed AS (
             |  SELECT event_id, user_id, event_type, value FROM events),
             |joined AS (
             |  SELECT p.*, n.n_name AS station,
             |    CASE WHEN p.value > -90 THEN p.value * 9 / 5 + 32 ELSE p.value END AS value_f
             |  FROM parsed p JOIN nation n ON p.user_id % 25 = n.n_nationkey),
             |dedup AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY event_id) AS rn
             |    FROM joined) t
             |  WHERE rn = 1)
             |SELECT event_id, user_id, station, event_type, value, value_f,
             |  TIMESTAMP '2026-01-01 00:00:00' AS date_added_utc
             |FROM dedup ORDER BY event_id""".stripMargin)
    ),

    // Watermark LATE-DATA semantics, registered under the hash gate (r16 —
    // q_late_arrival_profile PLANS a delay; this row EXECUTES one and pins
    // what the engine actually does to late rows, which every §2.4
    // watermark claim silently depends on): events are staged as four
    // single-file batches with controlled modification times —
    // middle-third A, then the oldest third split into B (even event_id,
    // arriving merely out of order) and C = the newest third, then D (odd
    // old rows, arriving AFTER the watermark has advanced past them) —
    // and a 1-hour tumbling count with a HALF-SPAN watermark (integer
    // hours, floor((max−min)/2) — adaptive so the drop and emission
    // boundaries land INSIDE the data at any corpus span, derived with
    // the same integer arithmetic on both engines) consumes them one
    // file per micro-batch. The oracle restates Spark's MEASURED
    // late-data contract (probed empirically this round, three
    // boundary experiments): (1) late-record FILTERING uses the PREVIOUS
    // micro-batch's watermark — stats through batch N−2 — so B, arriving
    // one batch behind A, is absorbed in full (out-of-order ≠ dropped);
    // (2) the drop predicate is WINDOW-END based, end_ms ≤ filter-wm
    // (a row older than the watermark still counts while its window's
    // state is live, and equality drops); (3) eviction/emission at batch
    // N uses stats through N−1: append emits a window once end_ms ≤
    // evict-wm, with everything absorbed so far. Net: the final table is
    // counts over A ∪ B ∪ C ∪ {D rows whose window end exceeds
    // max(A)−360h} restricted to windows ending ≤ max(all)−360h — every
    // boundary derived in milliseconds exactly as the engine derives it.
    // Scale shape: state is live-windows-bounded (the watermark's whole
    // point); the staging writes are fixture synthesis.
    Q(
      "q_stream_late_drop",
      (s, d) => {
        val src = tmpDir("graft_slate_src", d)
        val out = tmpDir("graft_slate_out", d)
        val ckpt = tmpDir("graft_slate_ckpt", d)
        new java.io.File(src).mkdirs()
        val ev = events(s, d).select(col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
        val qrow = ev.agg(
          expr("percentile(us, 0.33333333D)").as("t1"),
          expr("percentile(us, 0.66666667D)").as("t2"),
          min(col("us")).as("mn"),
          max(col("us")).as("mx")).head()
        val (t1, t2) = (qrow.getDouble(0), qrow.getDouble(1))
        val delayHours = (qrow.getLong(3) - qrow.getLong(2)) / 3600000000L / 2L
        def stageFile(name: String, cond: org.apache.spark.sql.Column, i: Int): Unit = {
          val tmp = s"$src/_stage"
          ev.filter(cond).select("event_id", "ts").coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = java.nio.file.Files
            .list(java.nio.file.Paths.get(tmp))
            .filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst()
            .get()
          java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$src/$name.parquet"))
          val f = new java.io.File(s"$src/$name.parquet")
          require(f.setLastModified(1000000L * (i + 1)),
            s"setLastModified unsupported on ${f.getPath}: cannot pin micro-batch arrival order")
          ()
        }
        stageFile("f0", col("us") > t1 && col("us") <= t2, 0) // A: the middle third
        stageFile("f1", col("us") <= t1 && col("event_id") % 2 === 0, 1) // B: old, out of order
        stageFile("f2", col("us") > t2, 2) // C: the newest third
        stageFile("f3", col("us") <= t1 && col("event_id") % 2 === 1, 3) // D: old AND late
        val schema = s.read.parquet(s"$src/f0.parquet").schema
        val q = s.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
          .withWatermark("ts", s"$delayHours hours")
          .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
          .writeStream
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            // Append emissions accumulate across micro-batches; tmpDir
            // wiped the sink, so plain appends collect the final table.
            b.select(col("window.start").as("window_start"), col("n"))
              .write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out).orderBy("window_start")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, epoch_us(ts) AS us FROM events),
             |q AS (
             |  SELECT quantile_cont(us, 0.33333333) AS t1,
             |    quantile_cont(us, 0.66666667) AS t2
             |  FROM ev),
             |parts AS (
             |  SELECT event_id, us,
             |    CASE WHEN us > (SELECT t2 FROM q) THEN 'C'
             |         WHEN us > (SELECT t1 FROM q) THEN 'A'
             |         WHEN event_id % 2 = 0 THEN 'B' ELSE 'D' END AS part
             |  FROM ev),
             |dl AS (
             |  SELECT ((MAX(us) - MIN(us)) // 3600000000 // 2) * 3600000 AS delay_ms
             |  FROM ev),
             |wm AS (
             |  SELECT
             |    (SELECT MAX(us) FROM parts WHERE part = 'A') // 1000
             |      - (SELECT delay_ms FROM dl) AS wm1_ms,
             |    (SELECT MAX(us) FROM parts) // 1000
             |      - (SELECT delay_ms FROM dl) AS wm3_ms),
             |kept AS (
             |  SELECT us FROM parts, wm
             |  WHERE part IN ('A', 'B', 'C')
             |     OR (us // 3600000000) * 3600000 + 3600000 > wm1_ms)
             |SELECT make_timestamp((us // 3600000000) * 3600000000) AS window_start,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM kept, wm
             |WHERE (us // 3600000000) * 3600000 + 3600000 <= wm3_ms
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Streaming CDC MERGE, registered end-to-end (the library form is
    // StreamingJobs.cdcUpsert, spec-proven under crashed-batch replay /
    // stale redelivery / checkpoint loss in MultimodalStreamingSpec —
    // this entry puts the whole path under the cross-engine hash gate
    // too): events re-staged as a FOUR-file change stream keyed by
    // user_id with event_id as the CDC sequence, consumed one file per
    // micro-batch (maxFilesPerTrigger=1, so the MERGE genuinely runs
    // four times against evolving main state), each batch collapsing
    // last-wins in-batch then seq-guard-merging into main via the
    // staging→MERGE sink. The oracle states what ONE batch MERGE of all
    // the data would leave: the max-event_id image per user — multi-batch
    // streamed upserts must converge to exactly that, regardless of file
    // order, because the seq guard drops stale rows. Scale shape: per
    // micro-batch cost is bounded by the BATCH (in-batch collapse is one
    // partial-agg groupBy; the main-side probe is a key-only semi-join
    // probe), never a corpus rescan — the incremental-dedup story on the
    // CDC axis.
    Q(
      "q_stream_cdc",
      (s, d) => {
        val src = tmpDir("graft_scdc_src", d)
        val staging = tmpDir("graft_scdc_stg", d)
        val main = tmpDir("graft_scdc_main", d)
        val ckpt = tmpDir("graft_scdc_ckpt", d)
        val ev = s.read
          .parquet(s"$d/events.parquet")
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        // Four range files on the SEQ column: realistic arrival (change
        // batches roughly ordered by sequence) while the seq guard, not
        // file order, carries correctness.
        ev.repartitionByRange(4, col("event_id")).write.mode("overwrite").parquet(src)
        val q = graft.streaming.StreamingJobs.cdcUpsert(
          s,
          src,
          ev.schema,
          staging,
          main,
          Seq("user_id"),
          "event_id",
          ckpt,
          lit("2026-01-01 00:00:00").cast("timestamp"),
          maxFilesPerTrigger = Some(1)
        )
        q.awaitTermination()
        s.read
          .parquet(main)
          .select("user_id", "event_id", "event_type", "value")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT user_id, event_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
             |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin)
    )
  )
}
