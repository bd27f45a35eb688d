package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps

/** EtlOps.resolveRedirects against a driver-walked reference resolver:
  * the depth claim q_redirect_resolve's comment makes (64-deep chains in
  * six checkpointed rounds) is exercised HERE with a real 64-deep chain,
  * plus loops, branches into a shared tail, over-depth cutoff, and the
  * checkpoint-cadence invariance (checkpointing is a lineage device — it
  * must never change results).
  */
class RedirectResolveSpec extends AnyFunSuite with SparkSpec {

  /** Driver-side ground truth: follow the map until a terminal node or
    * the visited set repeats (loop). */
  private def walk(edges: Map[String, String]): Map[String, (Option[String], Option[Long], Boolean)] =
    edges.keys.map { src =>
      var cur = edges(src)
      var hops = 1L
      val seen = scala.collection.mutable.Set(src)
      while (edges.contains(cur) && !seen(cur)) {
        seen += cur
        cur = edges(cur)
        hops += 1
      }
      src -> (if (edges.contains(cur)) (None, None, true) else (Some(cur), Some(hops), false))
    }.toMap

  private def resolveToMap(
      edges: Map[String, String],
      maxDepth: Int,
      checkpointEvery: Int = 2): Map[String, (Option[String], Option[Long], Boolean)] = {
    import spark.implicits._
    EtlOps
      .resolveRedirects(edges.toSeq.toDF("src", "dst"), maxDepth, checkpointEvery)
      .collect()
      .map(r => r.getString(0) -> (
        Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3)))
      .toMap
  }

  test("a 64-deep chain resolves in six checkpointed rounds, hops exact") {
    val chain = (0 until 64).map(i => s"u$i" -> s"u${i + 1}").toMap
    val got = resolveToMap(chain, maxDepth = 64)
    assert(got == walk(chain))
    assert(got("u0") == (Some("u64"), Some(64L), false))
    assert(got("u63") == (Some("u64"), Some(1L), false))
  }

  test("mixed topology: chains, branch into shared tail, 2-cycle, self-loop") {
    val edges = Map(
      "a" -> "b", "b" -> "c", "c" -> "t",      // 3-chain
      "x" -> "c",                              // branch joining mid-chain
      "p" -> "q", "q" -> "p",                  // 2-cycle
      "s" -> "s",                              // self-loop
      "lone" -> "t2")                          // direct
    val got = resolveToMap(edges, maxDepth = 8)
    assert(got == walk(edges))
    assert(got("x") == (Some("t"), Some(2L), false))
    assert(got("p")._3 && got("s")._3, "loops must flag is_cycle")
  }

  test("a chain deeper than maxDepth reports unresolved, not a wrong terminal") {
    val chain = (0 until 20).map(i => s"u$i" -> s"u${i + 1}").toMap
    val got = resolveToMap(chain, maxDepth = 8)
    // u0 is 20 hops from the terminal: after ceil(log2(8))=3 rounds its
    // cursor still sits on a redirecting node -> flagged, nulls.
    assert(got("u0") == (None, None, true))
    // u15 is 5 hops out (≤ 8): fully resolved despite the shallow budget.
    assert(got("u15") == (Some("u20"), Some(5L), false))
  }

  test("checkpoint cadence never changes results") {
    val edges =
      (0 until 16).map(i => s"c$i" -> s"c${i + 1}").toMap ++ Map("m" -> "n", "n" -> "m")
    val a = resolveToMap(edges, maxDepth = 16, checkpointEvery = 1)
    val b = resolveToMap(edges, maxDepth = 16, checkpointEvery = 3)
    val c = resolveToMap(edges, maxDepth = 16, checkpointEvery = 100)
    assert(a == b && b == c)
    assert(a == walk(edges))
  }
}
