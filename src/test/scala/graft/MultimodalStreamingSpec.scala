package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaDoc
import graft.streaming.StreamingJobs
import graft.streaming.StreamingJobs.SessionEvent

class MultimodalStreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("multimodal decode: deterministic frames, exact cardinality, partition-preserving, no shuffle") {
    val media = MultimodalOps
      .mediaTable(Tables.documents(spark, sfDir))
      .as[MediaDoc]
      .repartition(6)
    val frames = MultimodalOps.decodeFrames(media, frameStride = 2)

    // Narrow op: no exchange may appear between the scan and the decode.
    val plan = frames.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, s"decode must stay narrow:\n$plan")

    val expected = media
      .select(col("doc_id"), col("n_bytes"))
      .as[(Long, Long)]
      .collect()
      .map { case (_, n) => (MultimodalOps.frameCount(n) + 1) / 2 }
      .sum
    val out = frames.collect()
    assert(out.length == expected, "frame cardinality must be exact (stride 2)")
    assert(out.forall(f => f.width == 32 && f.height == 32), "frames must be resized to the target geometry")
    assert(out.forall(f => f.features.length == 16))
    assert(out.forall(f => math.abs(f.features.sum - 1.0) < 1e-9), "histogram must be normalized")

    // Determinism: a second run yields byte-identical features.
    val again = MultimodalOps.decodeFrames(media, frameStride = 2).collect()
    assert(out.sortBy(f => (f.doc_id, f.frame_idx)).map(_.features.toSeq).toSeq ==
      again.sortBy(f => (f.doc_id, f.frame_idx)).map(_.features.toSeq).toSeq)
  }

  test("streaming staged load: micro-batches merge into main incrementally and idempotently") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("sload").toString
    val src = s"$base/src"; val staging = s"$base/staging"
    val main = s"$base/main"; val ckpt = s"$base/ckpt"
    val clock = lit("2026-01-01 00:00:00").cast("timestamp")

    val batch1 = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    batch1.write.parquet(src)
    val schema = batch1.schema

    def runOnce(): Unit = {
      val q = graft.streaming.StreamingJobs
        .stagedLoad(spark, src, schema, staging, main, Seq("id"), ckpt, clock)
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(main).count() == 2)

    // No new files: AvailableNow with the same checkpoint is a no-op.
    runOnce()
    assert(spark.read.parquet(main).count() == 2)

    // A new file overlapping on key 2: only key 3 lands.
    Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v").write.mode("append").parquet(src)
    runOnce()
    val out = spark.read.parquet(main)
    assert(out.count() == 3)
    assert(out.columns.contains("date_added_utc"))

    // Checkpoint loss: the whole source replays, but the key anti-join
    // still makes it a no-op — idempotent end-to-end.
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    runOnce()
    assert(spark.read.parquet(main).count() == 3)
  }

  test("resize preserves constant images and is exact on integer scale factors") {
    val flat = Array.fill(24 * 24)(7.toByte)
    val r = MultimodalOps.resize(flat, 24, 24, 32, 32)
    assert(r.length == 32 * 32 && r.forall(_ == 7.toByte))
    // 2x2 checkerboard upscaled 2x: each source pixel becomes a 2x2 block.
    val checker = Array[Byte](0, 1, 1, 0)
    val up = MultimodalOps.resize(checker, 2, 2, 4, 4)
    assert(up.toSeq == Seq[Byte](0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0))
  }

  test("stateful sessionize matches the window-based batch formulation") {
    val evs = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[SessionEvent]
    val stateful = StreamingJobs
      .sessionize(evs, gapMinutes = 30)
      .select("user_id", "session_id", "n_events", "session_start", "session_end")

    val windowed = QueryRegistry
      .queries("q_stream_sessionize")(spark, sfDir)
      .select("user_id", "session_id", "n_events", "session_start", "session_end")

    assert(stateful.count() == windowed.count())
    assert(stateful.exceptAll(windowed).isEmpty && windowed.exceptAll(stateful).isEmpty,
      "flatMapGroupsWithState sessionization must be row-identical to the oracled window form")
  }
}
