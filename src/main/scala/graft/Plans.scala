package graft

import java.nio.file.{Files, Paths}

/** Writes PLANS.md: the formatted physical plan of each headline query —
  * the artifact of the "explain, then iterate until it's the plan you'd
  * want" loop. Regenerate after plan-shape changes:
  * `sbt "runMain graft.Plans /root/testdata/sf0.01"`.
  * PlanAuditSpec asserts the load-bearing shapes (pushdown, broadcast,
  * no-cartesian, codegen); this file is the human-readable companion.
  */
object Plans {
  val headline: Seq[String] = Seq(
    "q_agg_pricing",
    "q_filter_project",
    "q_revenue_by_nation",
    "q_incremental_watermark",
    "q_dedup_minhash",
    "q_dedup_embedding",
    "q_ngram_jaccard",
    "q_ann_ivfpq",
    "q_repetition_filter",
    "q_asof_join",
    "q_range_join",
    "q_profile",
    "q_cap_per_source",
    "q_decontaminate_bloom",
    "q_rollup_sales",
    "q_pack_context",
    // Vocab join is adaptive: AQE broadcasts the unigram-df side only when
    // its measured size fits; on web-scale vocabularies (1e8+ distinct
    // words) it shuffle-joins on the word key instead.
    "q_collocations",
    // Round 5: chunk dedup through partial-agg min(struct) (no chunk-key
    // window), char-window decontamination over the rolling-hash kernel,
    // SemDeDup's cluster-bounded self-join, and the single-buffer
    // winsorize threshold aggregate.
    "q_dedup_paragraphs",
    "q_decontaminate_chars",
    "q_semdedup",
    "q_winsorize",
    // Round 7: the incremental-dedup anti-join (bloom-pruned index probe),
    // the classifier's zero-shuffle fused-kernel scoring pass (since r11
    // the registered query is the banded audit; its plan still contains
    // the LinearTextScore scan subtree, and the production qualityScores
    // table carries the no-Exchange pin in ClassifierSpec), and the
    // resampler's running-frames-only window stack (the O(n²) following
    // frame this round's bench caught and killed).
    "q_dedup_incremental",
    "q_quality_classifier",
    "q_resample_interpolate",
    // Round 10: the explicit grouping-set Expand (×3, not CUBE's ×8),
    // the embed-outlier broadcast-centroid + pre-capped top-k shape,
    // zero-shuffle chunking, and the heap-bounded vocab build.
    "q_grouping_sets",
    "q_embed_outliers",
    "q_chunk_docs",
    "q_vocab_build",
    // Round 11 layout/sampling wave: the blocked-prefix systematic
    // weighted draw (windows carry __blk, offsets broadcast), the
    // inventory-only compaction planner, and the single-shuffle morton
    // span report.
    "q_weighted_sample",
    "q_compaction_plan",
    "q_zorder_layout",
    // The broadcast-CDF replacement for the hot-key percent_rank window.
    // (q_event_pagerank is omitted: its registered plan is the driver-loop
    // result table; the distributed iterate's shape is spec-pinned in
    // GraphCalibrationSpec instead.)
    "q_percentile_normalize",
    // The cross batch×index inverted-index probe and the two-layout
    // skipping simulation.
    "q_dedup_incremental_ngram",
    "q_skipping_stats",
    // Round 12: the tokenize→ids map-only stream, the native-kernel URL
    // pipeline (canonicalize collapsed to one static invoke after the
    // builtin tree blew janino under pushdown duplication), the map-only
    // HTML main-content extraction, and the second wave — retrieval (the
    // agg-carried best-doc posting rollup; BM25's no-explode scoring scan
    // + TakeOrdered), crawl frontier (Generate-only extraction; the
    // pre-capped host window), the one-scan DQ constraint suite, and the
    // 3-key truncation-energy rollup.
    "q_token_ids",
    "q_url_canonical",
    "q_url_dedup",
    "q_html_extract",
    "q_inverted_index",
    "q_bm25",
    "q_link_extract",
    "q_url_frontier",
    "q_dq_checks",
    "q_embed_truncate",
    // Round-12 closing wave: the positional-posting intersection, the
    // full-outer index merge, the scratch-materialized triangle closure
    // (no corpus re-scan in the report plan), the inventory-only vacuum
    // planner, and the blocked prefix-max lateness profile.
    "q_phrase_search",
    "q_index_merge",
    "q_graph_triangles",
    "q_vacuum_plan",
    "q_late_arrival_profile",
    // Round 13: the zero-shuffle token-budget chunker, the
    // frontier-plus-a-projection politeness plan (no added exchange — the
    // pin), the inventory-only as-of read (pick rides the aggregate), and
    // the codec-repartitioned phash pair audit (the round's
    // codec-parallelism fix made the id repartition part of the family's
    // plan shape; q_stream_join_outer / q_stream_cdc are streaming —
    // their shapes are spec-pinned in MultimodalStreamingSpec instead).
    "q_chunk_tokens",
    "q_frontier_politeness",
    "q_time_travel",
    "q_phash_images",
    // The broadcast-eval semantic decontamination map pass.
    "q_decontaminate_semantic",
    // Round 14: the one-exchange batch sessionization (both windows + the
    // refining aggregate on a single user_id shuffle), the partial-agg'd
    // survivorship election (max(struct) — no per-cluster window), and the
    // retrieval fuse→rerank pair (arms end in TakeOrderedAndProject; the
    // rerank feature join broadcasts the ≤k candidate set onto one pruned
    // documents scan).
    "q_sessionize_batch",
    "q_survivorship",
    "q_hybrid_rrf",
    "q_rerank",
    // The broadcast host-rules robots decision, the zero-shuffle Gopher
    // rule pass, and the one-scan sweep-line interval concurrency.
    "q_robots_filter",
    "q_gopher_quality",
    "q_interval_concurrency",
    // The one-scan tag-parse anchor rollup (election inside the agg).
    "q_anchor_text",
    // PSI drift monitor: broadcast cuts, bounded-domain rollups, no window.
    "q_drift_psi",
    // Round 15: the parsed-robots decision (host-cardinality typed-map
    // parse, broadcast rules, row-local regexp election), the drift
    // monitor's sketch twin (one dual-bin rollup bins both cut sets), and
    // the learned rerank (weights as plan constants over the same ≤k-row
    // broadcast feature join; q_stream_drift is streaming — shape pinned
    // by the batch≡stream spec; q_scd2_apply's registered plan is the
    // post-merge read-back, so its shape lives in its spec instead).
    "q_robots_parse",
    "q_drift_psi_approx",
    "q_rerank_learned",
    // Round 15 closing wave: the parsed-delay politeness schedule, the
    // binning-free KS monitor (one rollup + per-type cumulative window),
    // the broadcast-dimension geo argmin, the one-rollup anonymity audit,
    // and the row-local recrawl decision over the shared sitemap parse.
    "q_politeness_parsed",
    "q_drift_ks",
    "q_nearest_station",
    "q_anonymity_audit",
    "q_recrawl_schedule",
    // Round 16: the registered salting playbook (both halves), the
    // geospatial scale twin (cell candidate join), the chi-square drift
    // monitor, the bloom-pruned semi join, and the pointer-doubling
    // redirect resolver.
    "q_skew_salted",
    "q_skew_salted_join",
    "q_nearest_station_cells",
    "q_drift_chi2",
    "q_semi_join_bloom",
    "q_redirect_resolve",
    // Round 17: the composed crawl chain (frontier + broadcast robots +
    // row-local redirect/canonicalize + one dedup rollup — the no-new-
    // shuffle composition pin). The three e2e read-backs (q_nws_e2e,
    // q_wind_e2e like q_uscrn_e2e) register post-merge read-back plans,
    // so their shapes live in their builds/specs; q_mp4_meta and
    // q_warc_roundtrip are typed map/group passes.
    "q_crawl_e2e"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("local[4]", 8)
    val sb = new StringBuilder
    sb.append("# Physical plans (generated by `graft.Plans`, sf=")
      .append(sfDir)
      .append(")\n\nRegenerate: `sbt \"runMain graft.Plans <sfDir>\"`. ")
      .append("Plan shapes are pinned by PlanAuditSpec; this file is the readable companion.\n")
    for (name <- headline) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    System.err.println(s"[plans] wrote PLANS.md (${headline.length} queries)")
    spark.stop()
  }
}
