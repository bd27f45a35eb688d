package graft

/** §2.3 text-analysis operators — filled in incrementally. */
object TextQueries {
  val all: Seq[Q] = Seq()
}
