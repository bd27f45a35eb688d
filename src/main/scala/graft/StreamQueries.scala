package graft

/** §2.4 streaming operators — filled in incrementally. */
object StreamQueries {
  val all: Seq[Q] = Seq()
}
