package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for q_event_pagerank and q_percentile_normalize beyond their DuckDB
  * hash oracles: the pagerank operator is cross-checked against an
  * independent driver-side reference implementation of the SAME fixed-point
  * recurrence (so a Spark-side join/checkpoint bug can't hide behind the
  * oracle sharing its SQL shape), plus mass-conservation and determinism;
  * the percentile normalizer is proven equal to the textbook hot-key
  * percent_rank window it replaces.
  */
class GraphCalibrationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val R = 1000000000L

  /** Driver-side reference of the integer PageRank recurrence over an edge
    * list — same truncating DIVs, no Spark.
    */
  private def referenceRanks(
      edges: Seq[(String, String, Long)],
      nodes: Seq[String],
      iters: Int): Map[String, Long] = {
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rnk = nodes.map(_ -> R / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(rnk).sum
      val contrib = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (s, _, c) => rnk(s) * c / out(s) }.sum
        }
      rnk = nodes.map { v =>
        v -> ((15L * R) / (100L * n) + (85L * (contrib.getOrElse(v, 0L) + dang / n)) / 100L)
      }.toMap
    }
    rnk
  }

  test("q_event_pagerank matches the driver-side reference recurrence exactly") {
    val got = QueryRegistry
      .queries("q_event_pagerank")(spark, sfDir)
      .select("node", "rank_ppb")
      .as[(String, Long)]
      .collect()
      .toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val edges = Tables
      .events(spark, sfDir)
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)]
      .collect()
      .toSeq
    val nodes = Tables.events(spark, sfDir)
      .select("event_type").distinct().as[String].collect().toSeq.sorted

    assert(got == referenceRanks(edges, nodes, 10))
  }

  test("GraphOps.rankDistributed produces the SAME integers as the bounded driver loop") {
    // The two deployment shapes (driver loop for bounded node domains,
    // checkpointed DataFrame loop for web-scale graphs) must agree
    // bit-for-bit — the whole point of the fixed-point form. Includes a
    // dangling node (appears only as dst).
    val edges = Seq(
      ("a", "b", 3L), ("b", "a", 1L), ("b", "c", 2L), ("c", "a", 5L),
      ("a", "sink", 1L), ("c", "sink", 2L))
    val nodes = Seq("a", "b", "c", "sink")
    val want = graft.operators.GraphOps.rankBoundedGraph(edges, nodes, iters = 10)
    val got = graft.operators.GraphOps
      .rankDistributed(
        spark,
        edges.toDF("src", "dst", "cnt"),
        nodes.toDF("node"),
        iters = 10)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(got == want)
  }

  test("overflow guard: an edge count that would wrap rnk·cnt is rejected loudly") {
    val hot = Long.MaxValue / R + 1
    val e = intercept[IllegalArgumentException] {
      graft.operators.GraphOps.rankBoundedGraph(Seq(("a", "b", hot)), Seq("a", "b"), iters = 1)
    }
    assert(e.getMessage.contains("overflows int64"), e.getMessage)
  }

  test("q_event_pagerank: mass conserved up to deterministic truncation leak; ranks ≥ teleport floor") {
    val df = QueryRegistry.queries("q_event_pagerank")(spark, sfDir)
    val rows = df.select("node", "rank_ppb").as[(String, Long)].collect()
    val n = rows.length.toLong
    val mass = rows.map(_._2).sum
    // Each iteration truncates ≤ 1 ppb per edge-DIV plus the teleport and
    // dangling DIVs; with E ≤ n² edges and 10 iterations the leak is tiny
    // relative to R but NEVER negative (truncation only loses mass).
    assert(mass <= R && mass >= R - 10L * (n * n + 2L * n + 2L), s"mass=$mass")
    rows.foreach { case (node, r) =>
      assert(r >= (15L * R) / (100L * n) - 1, s"$node below teleport floor: $r")
    }
  }

  test("q_event_pagerank is bit-deterministic across runs") {
    val a = QueryRegistry.queries("q_event_pagerank")(spark, sfDir)
      .select("node", "rank_ppb").as[(String, Long)].collect().toMap
    val b = QueryRegistry.queries("q_event_pagerank")(spark, sfDir)
      .select("node", "rank_ppb").as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("dangling nodes feed the teleport term: a sink's mass is redistributed") {
    // A ← B, C→A, C→B; A is a sink (no out-edges). If dangling mass were
    // dropped, total mass would decay by ~A's share per iteration; with
    // redistribution it stays ≈ R.
    val edges = Seq(("b", "a", 1L), ("c", "a", 1L), ("c", "b", 1L))
    val nodes = Seq("a", "b", "c")
    val rnk = referenceRanks(edges, nodes, 10)
    assert(rnk.values.sum > R - 1000L, s"dangling mass lost: ${rnk.values.sum}")
    // The sink accumulates the most rank.
    assert(rnk("a") > rnk("b") && rnk("b") > rnk("c"), rnk.toString)
  }

  test("q_percentile_normalize equals the textbook percent_rank window") {
    val got = QueryRegistry
      .queries("q_percentile_normalize")(spark, sfDir)
      .select("doc_id", "pr")
      .as[(Long, Double)]
      .collect()
      .toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("n_chars")
    val want = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), percent_rank().over(w).as("pr"))
      .as[(Long, Double)]
      .collect()
      .toMap
    // Bit-exact: both are one integer/integer double division per row.
    assert(got == want)
  }

  test("q_percentile_normalize: a single-doc language normalizes to 0.0, ties share their rank") {
    val df = Seq(
      (1L, "xx", 10L),
      (2L, "yy", 5L), (3L, "yy", 5L), (4L, "yy", 7L), (5L, "yy", 9L), (6L, "yy", 9L)
    ).toDF("doc_id", "lang", "n_chars").createOrReplaceTempView("tmp_pn_docs")
    try {
      // Rebuild the operator's CDF form inline over the tiny frame.
      import org.apache.spark.sql.expressions.Window
      val docs = spark.table("tmp_pn_docs")
      val wCdf = Window.partitionBy("lang").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val counts = docs.groupBy("lang", "n_chars").agg(count(lit(1)).as("cnt"))
      val cdf = counts.withColumn("cum_less", sum(col("cnt")).over(wCdf) - col("cnt"))
      val totals = counts.groupBy("lang").agg(sum(col("cnt")).as("n_l"))
      val out = docs
        .join(broadcast(cdf.join(totals, "lang")), Seq("lang", "n_chars"))
        .select(
          col("doc_id"),
          when(col("n_l") === 1, lit(0.0))
            .otherwise(col("cum_less").cast("double") / (col("n_l") - 1)).as("pr"))
        .as[(Long, Double)].collect().toMap
      assert(out(1L) == 0.0)
      assert(out(2L) == 0.0 && out(3L) == 0.0)
      assert(out(4L) == 0.5)
      assert(out(5L) == 0.75 && out(6L) == 0.75)
    } finally spark.catalog.dropTempView("tmp_pn_docs")
  }
}
