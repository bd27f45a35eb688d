package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the retrieval family (q_inverted_index / q_bm25) on
  * hand-computed fixtures: posting-list stats, the deterministic top-doc
  * tie-break, and BM25's two defining monotonicities (more occurrences
  * score higher at equal length; equal occurrences score lower in a
  * longer doc).
  */
class RetrievalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("invertedIndex: df/cf/max_tf and top-doc tie-break (highest tf, then lowest doc_id)") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, "b c"),
      (3L, "B a a") // case-folds; ties doc 1 on tf(a)=2 -> doc 1 wins
    ).toDF("doc_id", "text")
    val out = TextQueries
      .invertedIndex(docs)
      .orderBy("term")
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(
      out == Seq(
        ("a", 2L, 4L, 2L, 1L), // df 2 (docs 1,3), cf 4, max tf 2, tie 1 vs 3 -> 1
        ("b", 3L, 3L, 1L, 1L), // every doc once; lowest doc_id wins
        ("c", 1L, 1L, 1L, 2L)
      )
    )
  }

  test("bm25Rank: hand-computed score, monotonicities, non-matches excluded, k respected") {
    // Four docs, query = {x}: N = 4, df = 3, avgdl = (2+2+4+2)/4 = 2.5.
    val docs = Seq(
      (1L, "x y"), // tf 1, dl 2
      (2L, "x x"), // tf 2, dl 2 — more occurrences, same length: must beat doc 1
      (3L, "x y z w"), // tf 1, dl 4 — same tf, longer: must score below doc 1
      (4L, "y z") // no match: excluded
    ).toDF("doc_id", "text")
    val out = TextQueries
      .bm25Rank(docs, Seq("x"), k = 10)
      .as[(Long, Double, Int)]
      .collect()
      .toSeq
    assert(out.map(_._1) == Seq(2L, 1L, 3L), s"ranking wrong: $out")
    assert(out.forall(_._3 == 1))
    // Hand computation for doc 1: idf = ln((4 - 3 + 0.5)/(3 + 0.5) + 1),
    // denom = 1 + 1.2 * (0.25 + 0.75 * 2/2.5).
    val idf = math.log((4 - 3 + 0.5) / (3 + 0.5) + 1.0)
    val expected1 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.5))
    assert(math.abs(out.find(_._1 == 1L).get._2 - expected1) < 1e-6)
  }

  test("q_phrase_search semantics: adjacency only, repeats counted, 1-based first position") {
    val docs = Seq(
      (1L, "batch window start"), // match at pos 1
      (2L, "a batch window batch window"), // two matches, first at 2
      (3L, "batch a window"), // not adjacent
      (4L, "window batch"), // wrong order
      (5L, "batch batch window") // only the second 'batch' matches
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("phrase_fix").toString
    docs.withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = QueryRegistry
      .queries("q_phrase_search")(spark, dir)
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 2L, 2L), (5L, 1L, 2L)), s"got $out")
  }

  test("q_index_merge: merged stats equal a from-scratch full-corpus index (mergeability)") {
    // The whole point of incremental maintenance: indexing the batch
    // alone and adding is indistinguishable from re-indexing everything.
    val merged = QueryRegistry
      .queries("q_index_merge")(spark, sfDir)
      .select("term", "df", "cf")
    val full = TextQueries
      .invertedIndex(Tables.documents(spark, sfDir))
      .select("term", "df", "cf")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "merge must equal the from-scratch index")
  }

  test("bm25Rank: k caps the result and multi-term matches count n_matched") {
    val docs = Seq(
      (1L, "x y"),
      (2L, "x q"),
      (3L, "y q"),
      (4L, "x y q")
    ).toDF("doc_id", "text")
    val out = TextQueries.bm25Rank(docs, Seq("x", "y"), k = 2).as[(Long, Double, Int)].collect()
    assert(out.length == 2)
    // Doc 4 matches both terms but is longer; doc 1 matches both at dl 2 —
    // doc 1 must lead, and both report n_matched = 2.
    assert(out.head._1 == 1L && out.head._3 == 2)
  }

  test("robotsBestMatch: longest wins, allow breaks same-length ties, no match is null") {
    // Hand cases for the Google-semantics election the robots oracle
    // restates relationally — pinned here so a refactor of the row-local
    // kernel can't silently change the tiebreak.
    def rules(rs: (String, Boolean)*) =
      array(rs.map { case (p, a) => struct(lit(p).as("prefix"), lit(a).as("allow")) }: _*)
    val cases = Seq(
      // (rule set, path, expected (allow, prefix) or None)
      (Seq("/a" -> false, "/a/b" -> true), "/a/b/c", Some((true, "/a/b"))), // longest wins
      (Seq("/a/b" -> true, "/a" -> false), "/a/b/c", Some((true, "/a/b"))), // order-independent
      (Seq("/x" -> false, "/x" -> true), "/x/y", Some((true, "/x"))), // allow wins the tie
      (Seq("/a" -> false), "/b", None), // no match -> null -> allowed default
      (Seq("/a" -> false, "/ab" -> true), "/ab9", Some((true, "/ab"))) // string prefix, not segment
    )
    for (((rs, path, expected), i) <- cases.zipWithIndex) {
      val row = spark
        .range(1)
        .select(TextQueries.robotsBestMatch(rules(rs: _*), lit(path)).as("best"))
        .select(col("best.allow"), col("best.prefix"))
        .head()
      val got = if (row.isNullAt(0)) None else Some((row.getBoolean(0), row.getString(1)))
      assert(got == expected, s"case $i: rules=$rs path=$path got=$got")
    }
  }

  test("q_rerank permutes exactly the fused RRF candidate set (no drops, no dups)") {
    // The feature join back to documents must neither lose a candidate
    // (a missing doc row) nor duplicate one (a fan-out join bug) — the
    // rerank is a reordering of q_hybrid_rrf's top-k, nothing else.
    val fused = QueryRegistry.queries("q_hybrid_rrf")(spark, sfDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val reranked = QueryRegistry.queries("q_rerank")(spark, sfDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(reranked == fused, s"rerank must permute the fused set: $reranked vs $fused")
  }

  test("q_gopher_quality hand case: counts, mean length, and the stop floor") {
    val docs = Seq(
      (1L, "the cat sat on a mat"), // 6 words, the+a present -> n_stop 2
      (2L, "zz zz zz") // 3 words, no stop words
    ).toDF("doc_id", "text").withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    // Drive the registered query's expressions through a temp fixture dir
    // (the query reads documents.parquet from its sf dir).
    val dir = java.nio.file.Files.createTempDirectory("gopher_hand").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = QueryRegistry.queries("q_gopher_quality")(spark, dir)
      .orderBy("doc_id")
      .collect()
    assert(out(0).getAs[Int]("n_words") == 6)
    assert(math.abs(out(0).getAs[Double]("mean_word_len") - 15.0 / 6.0) < 1e-6)
    assert(out(0).getAs[Int]("n_stop_present") == 2)
    assert(!out(0).getAs[Boolean]("gopher_ok"), "6 words is under the 50-word floor")
    assert(out(1).getAs[Int]("n_stop_present") == 0)
    assert(out(1).getAs[Double]("alpha_word_ratio") == 1.0)
  }
}
