package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph centrality (PageRank) in the fixed-point integer form.
  *
  * Why integer: float PageRank sums partial contributions in partition
  * order, so ranks drift by ulps per iteration per engine/run — the
  * truncating-DIV fixed-point recurrence (ranks in parts-per-R) is
  * bit-identical across Spark, DuckDB, retries, and partitionings, which
  * also makes iterative production runs safely resumable (re-running
  * iteration i reproduces it exactly). Mass leaks ≤ 1 ppR per DIV —
  * bounded, deterministic, ~1e-7 relative over 10 iterations.
  *
  * Recurrence (d = 0.85 as 85/100, teleport 15/100, dangling mass
  * redistributed uniformly):
  *
  *   r'(v) = (15·R) DIV (100·N)
  *         + (85 · (Σ_u (r(u)·cnt(u,v)) DIV out(u) + dang DIV N)) DIV 100
  *
  * Two deployment shapes, same recurrence, spec-pinned equal:
  *
  *   - [[rankBoundedGraph]] — node domain bounded by construction (event
  *     types, languages, sources: the lang/source-cardinality contract).
  *     The corpus-sized edge build stays distributed; the K²-bounded edge
  *     list collapses map-side and iterates on the driver — the k-means
  *     centroid-loop pattern. No per-iteration Spark jobs at all.
  *   - [[rankDistributed]] — web-scale node sets (domain/hyperlink graphs,
  *     ~1e7 nodes at 100 TB). Ranks stay a distributed table; each
  *     iteration is one equi-join + partial agg, with every iterate
  *     localCheckpoint'ed: the iterate is referenced twice (dangling mass
  *     + contributions), so without materialization lineage doubles per
  *     iteration — the checkpoint discipline any production iterative job
  *     needs.
  */
object GraphOps {
  val DefaultScale: Long = 1000000000L

  /** Driver-side fixed-point loop over a bounded edge list. */
  def rankBoundedGraph(
      edges: Seq[(String, String, Long)],
      nodes: Seq[String],
      iters: Int,
      scale: Long = DefaultScale
  ): Map[String, Long] = {
    require(nodes.nonEmpty, "rankBoundedGraph: empty node set")
    require(
      nodes.size <= 65536,
      s"rankBoundedGraph: ${nodes.size} nodes — bounded-domain driver state only; " +
        "use rankDistributed for web-scale node sets")
    // rnk ≤ scale (mass is conserved-or-leaked, never created), so the
    // contribution product rnk·cnt is bounded by scale·cnt — guard the
    // edge counts once instead of letting a hot transition cell wrap
    // int64 into silent garbage ranks. At the 1e12-event extreme, shrink
    // `scale` (precision trades linearly) or pre-divide edge counts by a
    // common factor (the recurrence only reads cnt/out ratios).
    val cntCap = Long.MaxValue / scale
    edges.find(_._3 > cntCap).foreach { e =>
      throw new IllegalArgumentException(
        s"rankBoundedGraph: edge count ${e._3} × scale $scale overflows int64 — " +
          "use a smaller scale or pre-scale edge counts (ratios are what matters)")
    }
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rnk = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(rnk).sum
      val contrib = edges
        .groupBy(_._2)
        .map { case (dst, es) => dst -> es.map { case (s, _, c) => rnk(s) * c / out(s) }.sum }
      rnk = nodes.map { v =>
        v -> ((15L * scale) / (100L * n) +
          (85L * (contrib.getOrElse(v, 0L) + dang / n)) / 100L)
      }.toMap
    }
    rnk
  }

  /** Distributed fixed-point loop: ranks live in a DataFrame keyed by
    * `node`; `edges` has columns (src, dst, cnt). One equi-join + partial
    * agg per iteration; all graph tables and each iterate are
    * localCheckpoint'ed (see object doc). Output: (node, rnk).
    */
  def rankDistributed(
      spark: SparkSession,
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int,
      scale: Long = DefaultScale
  ): DataFrame = {
    // Same overflow guard as rankBoundedGraph, evaluated once on the edge
    // materialization: rnk ≤ scale, so rnk·cnt ≤ scale·cnt must fit int64.
    val cntCap = Long.MaxValue / scale
    val e = edges
      .withColumn(
        "cnt",
        when(col("cnt") <= cntCap, col("cnt")).otherwise(raise_error(concat(
          lit(s"rankDistributed: edge count "), col("cnt").cast("string"),
          lit(s" × scale $scale overflows int64 — use a smaller scale or pre-scale edge counts")))))
      .localCheckpoint(true)
    val outd = e.groupBy("src").agg(sum(col("cnt")).as("out_cnt")).localCheckpoint(true)
    val nd = nodes.localCheckpoint(true)
    val dnodes = nd.join(outd.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint(true)
    val nn = broadcast(nd.agg(count(lit(1)).as("n")).localCheckpoint(true))

    var ranks = nd.crossJoin(nn)
      .select(col("node"), expr(s"${scale}L DIV n").as("rnk"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val dang = broadcast(
        ranks.join(dnodes, "node").agg(coalesce(sum(col("rnk")), lit(0L)).as("dang")))
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outd, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(rnk * cnt) DIV out_cnt")).as("contrib"))
      ranks = nd
        .join(contrib, Seq("node"), "left")
        .crossJoin(nn)
        .crossJoin(dang)
        .select(
          col("node"),
          expr(s"(15L * $scale) DIV (100L * n) + (85L * (coalesce(contrib, 0L) + dang DIV n)) DIV 100L")
            .as("rnk"))
        .localCheckpoint(true)
    }
    ranks
  }
}
