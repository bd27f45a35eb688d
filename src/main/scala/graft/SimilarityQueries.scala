package graft

/** §2.3 dedup/similarity operators — filled in incrementally. */
object SimilarityQueries {
  val all: Seq[Q] = Seq()
}
