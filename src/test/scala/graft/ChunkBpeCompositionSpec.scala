package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_chunk_tokens' production composition: the SAME chunker
  * (TextQueries.chunkTokenArray) fed BPE symbol arrays instead of
  * whitespace tokens — token BUDGETS are what a context window meters, and
  * the BPE axis is the one a trainer pays. The merge loop isn't
  * SQL-expressible, so this arm is gated here instead of the DuckDB
  * oracle: an independent Scala sliding-window reference plus the
  * coverage/budget/overlap invariants that define the rule.
  */
class ChunkBpeCompositionSpec extends AnyFunSuite with SparkSpec {

  private val budget = 50
  private val stride = 40

  /** (doc_id, chunk_id, chunk, n_tokens) from the production chunker over
    * BPE symbol arrays, grouped per doc in chunk order.
    */
  private lazy val chunks: Map[Long, Seq[(Int, String, Int)]] = TextQueries
    .chunkTokenArray(
      TextQueries.bpeSegmentsTable(spark, sfDir),
      when(col("segments") === "", array().cast("array<string>"))
        .otherwise(split(col("segments"), " ")),
      budget,
      stride)
    .collect()
    .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getInt(3))))
    .groupBy(_._1)
    .map { case (id, rs) => id -> rs.map(_._2).sortBy(_._1).toSeq }

  /** Each doc's full BPE symbol stream, independently split driver-side. */
  private lazy val streams: Map[Long, Seq[String]] = TextQueries
    .bpeSegmentsTable(spark, sfDir)
    .select(col("doc_id"), col("segments"))
    .collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    .toMap

  test("BPE chunking equals an independent sliding-window reference, doc for doc") {
    assert(chunks.keySet == streams.keySet, "every doc must chunk (empty docs keep one empty chunk)")
    for ((id, got) <- chunks) {
      val toks = streams(id)
      val want = (0 to math.max(toks.length - 1, 0) by stride).map(s => toks.slice(s, s + budget))
      assert(got.length == want.length, s"doc $id: chunk count ${got.length} != ${want.length}")
      for (((cid, chunk, n), w) <- got.zip(want)) {
        assert(chunk == w.mkString(" "), s"doc $id chunk $cid text drifted")
        assert(n == w.length, s"doc $id chunk $cid token count drifted")
      }
    }
  }

  test("budget, overlap, and loss-free coverage invariants hold on every chunk") {
    for ((id, got) <- chunks) {
      assert(got.forall(_._3 <= budget), s"doc $id: a chunk exceeds the $budget-token budget")
      val ctoks = got.map(_._2.split(" ").filter(_.nonEmpty).toSeq)
      // Dropping each chunk's trailing overlap (keeping its first `stride`
      // tokens; the last chunk keeps everything) must rebuild the full
      // symbol stream exactly — a dropped, duplicated, or reordered symbol
      // anywhere breaks the equality.
      val rebuilt = ctoks.dropRight(1).flatMap(_.take(stride)) ++ ctoks.last
      assert(rebuilt == streams(id), s"doc $id: overlap-stripped chunks must rebuild the symbol stream")
      // Consecutive chunks share the previous chunk's tail beyond the
      // stride (budget − stride tokens, fewer where the stream ends).
      ctoks.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.startsWith(a.drop(stride)), s"doc $id: chunk overlap must be the previous chunk's tail")
        case _ => ()
      }
    }
  }
}
