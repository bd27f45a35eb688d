package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's late-data contract that q_stream_late_drop's oracle
  * restates (measured empirically in round 16 with these exact probes) —
  * if a Spark upgrade moves any of the three rules, THIS spec goes red
  * with a named rule instead of the oracle mysteriously hash-mismatching:
  *
  *   1. late-record FILTERING uses the PREVIOUS micro-batch's watermark
  *      (event-time stats through batch N−2), so data arriving one batch
  *      out of order is absorbed in full;
  *   2. the drop predicate is WINDOW-END based with equality dropping
  *      (window.end ≤ filter-watermark) — a row older than the watermark
  *      still counts while its window is live;
  *   3. eviction/emission at batch N uses stats through N−1, append
  *      emitting once window.end ≤ evict-watermark (equality emits).
  */
class WatermarkSemanticsSpec extends AnyFunSuite with SparkSpec {

  private def us(h: Int, m: Int, s: Int = 0): Long =
    java.time.LocalDateTime.of(2024, 1, 1, h, m, s).toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  /** One file per micro-batch in `files` order (controlled mtimes), 1-hour
    * tumbling count, 30-minute watermark, append mode; returns the emitted
    * (batchId, windowStartHour, n) rows.
    */
  private def run(name: String, files: Seq[Seq[Long]]): Seq[(Long, Int, Long)] = {
    val dir = EtlQueries.scratchDir(s"graft_wmspec_$name", name)
    new java.io.File(dir).mkdirs()
    import spark.implicits._
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$dir/_t"
      rows.toDF("tsus").select(timestamp_micros(col("tsus")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp))
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, Paths.get(s"$dir/f$i.parquet"))
      require(new java.io.File(s"$dir/f$i.parquet").setLastModified(1000000L * (i + 1)),
        s"setLastModified unsupported on $dir/f$i.parquet: cannot pin arrival order")
    }
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
    val schema = spark.read.parquet(s"$dir/f0.parquet").schema
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.select(hour(col("window.start")), col("n")).collect()
          .foreach(r => out.synchronized { out += ((id, r.getInt(0), r.getLong(1))) })
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    out.toSeq
  }

  test("rule 1+3: out-of-order data one batch behind is absorbed; emission uses stats through N−1, equality emits") {
    // Batch 0: 12:10, 13:30 → evict-wm after = 13:00. Batch 1 brings 11:30
    // (well below that watermark): filtering lags one batch, so it is
    // absorbed, and [11,12) AND [12,13) (end == 13:00, equality) emit at
    // batch 1. Batch 3's 10:10 (end 11:00 ≤ filter-wm 13:00) is dropped.
    val got = run("a", Seq(
      Seq(us(12, 10), us(13, 30)),
      Seq(us(11, 30)),
      Seq(us(15, 0)),
      Seq(us(10, 10))))
    assert(got.filter(_._1 == 1).map(r => (r._2, r._3)).sorted == Seq((11, 1L), (12, 1L)),
      s"batch-1 emissions off: $got")
    assert(!got.exists(_._2 == 10), s"the beyond-watermark 10:10 row must be dropped: $got")
    assert(got.collect { case (_, 13, n) => n } == Seq(1L), s"[13,14) must emit once: $got")
  }

  test("rule 2: the drop predicate is window-end based — older-than-watermark rows keep counting while their window is live") {
    // filter-wm at batch 3 = 13:20 − 30m = 12:50 (stats through batch 1).
    // 12:45 (< wm) lands in the LIVE [12,13) window (end 13:00 > wm) and
    // must count; 11:45 ([11,12), end 12:00 ≤ wm) must drop.
    val got = run("b", Seq(
      Seq(us(12, 20), us(13, 20)),
      Seq(us(11, 15)),
      Seq(us(15, 0)),
      Seq(us(12, 45), us(11, 45))))
    assert(got.collect { case (_, 12, n) => n } == Seq(2L),
      s"[12,13) must absorb the late-but-live 12:45 row: $got")
    assert(got.collect { case (_, 11, n) => n } == Seq(1L),
      s"[11,12) must emit exactly once without the dropped 11:45: $got")
  }

  test("rule 2 equality: window end == filter-watermark drops") {
    // filter-wm at batch 3 = 12:30 − 30m = 12:00; the 11:55 row's window
    // ends exactly at 12:00 → dropped (≤, not <).
    val got = run("c", Seq(
      Seq(us(12, 30)),
      Seq(us(10, 30)),
      Seq(us(15, 0)),
      Seq(us(11, 55))))
    assert(got.collect { case (_, 11, n) => n }.isEmpty,
      s"the end==watermark window must not resurrect: $got")
    assert(got.collect { case (_, 10, n) => n } == Seq(1L) &&
      got.collect { case (_, 12, n) => n } == Seq(1L), s"unexpected emissions: $got")
  }
}
