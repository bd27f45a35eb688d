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
    assert(out.forall(f => f.features.length == 16))
    assert(out.forall(f => math.abs(f.features.sum - 1.0) < 1e-9), "histogram must be normalized")

    // Determinism: a second run yields byte-identical features.
    val again = MultimodalOps.decodeFrames(media, frameStride = 2).collect()
    assert(out.sortBy(f => (f.doc_id, f.frame_idx)).map(_.features.toSeq).toSeq ==
      again.sortBy(f => (f.doc_id, f.frame_idx)).map(_.features.toSeq).toSeq)
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
