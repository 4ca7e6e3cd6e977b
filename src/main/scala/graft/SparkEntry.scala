package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (one entry per SURVEY.md §2
  * operator / capability); `oracleSql` holds the DuckDB-equivalent ANSI
  * SQL with identical column names and total ORDER BY for hash-stable
  * comparison. Queries without an oracle entry (hash-family LSH ops,
  * approx aggregates, stubbed media decode) are validated by ScalaTest
  * specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline's transform chain (parse -> flatten ->
    * derive -> filter -> dedup) over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_flatten_project")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.defs ++ RelationalQueries.defs ++ TextQueries.defs ++ EventQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++ EventQueries.oracles

  /** Representative heavy queries timed by Bench (one per plan family:
    * scan+agg, shuffle join, semi join, window, set-op chain, range join,
    * dedup hash + LSH, vector search, text pass, sessionize, stream-window).
    */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q_star_join", "q_semi_join", "q_window_rank",
    "q_union_distinct_limit", "q_range_join", "q_asof_join",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
    "q_ngram_jaccard", "q_dup_clusters", "q_dup_clusters_sql",
    "q_dedup_full_sql", "q_quality_filter",
    "q_embed_cosine_topk", "q_embed_ann_lsh",
    "q_embed_ann_ivf", "q_winnow", "q_text_stats", "q_vocab_topk",
    "q_tfidf_top", "q_sessionize", "q_tumbling_window",
    "q_span_dedup", "q_gap_fill", "q_bloom_semi_join",
    "q_decontaminate", "q_sketch_merge", "q_asof_nearest", "q_domain_cap",
    "q_kmeans_iter", "q_embed_pq", "q_embed_ivfpq", "q_semdedup",
    "q_funnel", "q_scd2", "q_anomaly_mad", "q_heavy_hitters",
    "q_mix_sample", "q_hard_negatives", "q_stats_agg", "q_bpe_merges",
    "q_embed_bq", "q_bm25", "q_bigram_lm", "q_pmi_top", "q_hybrid_rrf",
    "q_incr_dedup", "q_embed_quant", "q_ppl_strata", "q_bpe_encode",
    "q_pagerank", "q_novelty", "q_event_paths", "q_drift_psi", "q_ewma",
    "q_basket_rules", "q_triangle_count", "q_containment", "q_rfm",
    "q_streak", "q_ab_test", "q_gini", "q_tpch_q5", "q_heaps",
    "q_growth_accounting", "q_dsir", "q_distinct_n", "q_zipf",
    "q_kneser_ney", "q_media_phash", "q_keyness", "q_mutual_nn",
    "q_kcore", "q_minhash_est", "q_fuzzy_decontam", "q_cluster_canonical",
    "q_knn_label_acc", "q_k_anonymity", "q_oov_rate", "q_tpch_q10",
    "q_tpch_q21", "q_tpch_q2", "q_tpch_q13", "q_tpch_q17", "q_tpch_q18",
    "q_tpch_q22", "q_linear_quality", "q_token_entropy",
    "q_tpch_q4", "q_tpch_q6", "q_tpch_q7", "q_tpch_q9", "q_tpch_q11",
    "q_tpch_q12", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16", "q_tpch_q19",
    "q_tpch_q20", "q_tpch_q3", "q_tpch_q8", "q_cdc_diff", "q_cdc_sql",
    "q_cdc_apply", "q_cdc_apply_sql", "q_mv_rewrite", "q_mv_rewrite_sql",
    "q_logreg_step", "q_dp_noise",
    // r11 additions: the de-interpreted kernels, the WAV roundtrip, the
    // DoReMi-style mixture-reweight step, LPA communities, the JL
    // projection audit, the oracle-checked CMS, and audio-fingerprint
    // dedup
    "q_bootstrap", "q_lang_ngram", "q_audio_decode", "q_mix_reweight",
    "q_label_prop", "q_embed_rp", "q_cms_est", "q_audio_fingerprint",
    // r12 additions: the retrieval cascade's rerank stage and the
    // through-the-container video-fingerprint dedup (audio's twin)
    "q_rerank", "q_video_fingerprint",
    // r12 second wave: the interval sweeps, the prefix-filtered
    // set-similarity join, grid-exact Naive Bayes, and the distributed
    // covariance
    "q_interval_coverage", "q_interval_overlap", "q_setsim_prefix",
    "q_naive_bayes", "q_embed_cov",
    // r12 third wave: PAV isotonic calibration, Fellegi-Sunter record
    // linkage, rendezvous-hash shard routing, and the blocklist gate
    "q_isotonic_cal", "q_record_linkage", "q_shard_assign", "q_blocklist",
    "q_woe_iv", "q_blocklist_240",
    // r12 fourth wave: position-level exact repeated-substring spans,
    // their excision transform, the zero-shuffle bucketed join, and the
    // whole-operator (LogicalPlan+Strategy+SparkPlan) as-of join
    "q_repeated_spans", "q_span_excise", "q_bucket_join", "q_asof_native",
    "q_bcubed", "q_shard_stratified", "q_bucket_prune", "q_decontam_excise",
    // r14: the nearest-direction native as-of (q_asof_nearest's oracle
    // through the O(1)-state merge) and the PIT enrichment now routed
    // through the native exec
    "q_asof_native_nearest", "q_pit_enrich",
    // r14 second wave: the composite-key native as-of under its own
    // DuckDB oracle (user_id + calendar day), and the zero-fact-shuffle
    // broadcast as-of on the shared backward oracle
    "q_asof_native_keys", "q_asof_bcast",
    // r15: the stats-driven Auto strategy and the graft_asof /
    // graft_dedup / graft_ann SQL table-valued spellings, each under
    // its DataFrame twin's shared oracle
    "q_asof_auto", "q_asof_sql", "q_dedup_sql", "q_ann_sql",
    // r16: the persisted-ANN-index probes (first run pays the one-time
    // build, min-of-3 reuses the stored layout — the q_bucket_join
    // amortization pattern applied to the vector tier)
    "q_ann_indexed", "q_ann_indexed_pq", "q_ann_filtered",
    "q_ann_filtered_sql", "q_ann_filtered_eval", "q_ann_filtered_k",
    // r16: the last two TVF spellings — full SQL parity for every
    // bespoke operator family, each under its DataFrame twin's oracle —
    // plus the stored-index probe's SQL spelling
    "q_fuzzy_sql", "q_range_sql", "q_ann_indexed_sql",
    // r16 second wave — the new tiers: robust JSONL ingestion
    // (permissive parse + quarantine over the derived corpus), table
    // maintenance (small-file compaction; scan of the compacted copy),
    // index maintenance (tombstone-deleted stored-index probe), and the
    // Spark 4 pipe-syntax SQL surface. The ensure()-style one-time
    // derived writes amortize across min-of-3 like q_bucket_join.
    "q_jsonl_ingest", "q_compact_scan", "q_ann_index_delete", "q_pipe_sql",
    // the ingest TVF spelling and the index-staleness audit (the
    // quantizer-cadence cycle's scheduling signal)
    "q_ingest_sql", "q_ann_index_drift",
    // r17: the widened MV rewrite — avg-from-partials, key-column
    // filters applied to the summary, and the star-schema join rewrite
    // (summary ⋈ dim instead of fact ⋈ dim) with its SQL twin
    "q_mv_rewrite_avg", "q_mv_rewrite_filter", "q_mv_rewrite_join",
    "q_mv_rewrite_join_sql",
    // r17: the guaranteed-k filtered probe's SQL spelling (graft_ann
    // 'guaranteed_k' mode with filter_sql + nprobe), and the
    // schema-drift change feed (align-by-name diff with null-fill)
    "q_ann_filtered_k_sql", "q_cdc_drift",
    // r17: the TVF parity tail — heavy hitters and the bloom semi-join
    // reach SQL, closing full TVF coverage of the bespoke operators
    "q_heavy_hitters_sql", "q_bloom_sql",
    // r17: HAVING composed over the MV rewrite, the end-to-end IVM
    // freshness gate (all partials through maintain(), base oracle),
    // and the multi-hop star rewrite (fact deep in a left-deep chain)
    "q_mv_rewrite_having", "q_mv_ivm", "q_mv_rewrite_star2",
    // r17: sum-of-expression partials (the exact-cents revenue idiom
    // answered from the summary) and ROLLUP re-expanded over the summary
    "q_mv_rewrite_expr", "q_mv_rewrite_rollup", "q_mv_rewrite_gsets",
    "q_mv_rewrite_distinct",
    // r19: cluster-once-read-many — the stored-assignment consumers
    // (bench lines show the marginal consumer cost once the clustering
    // is persisted) and the semantic-dedup TVF spelling
    "q_dedup_full_stored", "q_cluster_canonical_stored",
    "q_leakage_safe_split_stored", "q_bcubed_stored", "q_semdedup_sql",
    // r19: summary-over-summary and the UNION ALL fact shape
    "q_mv_rewrite_rollup2", "q_mv_rewrite_union", "q_mv_rewrite_union_sql",
    // r19 second wave: the incremental store under the oracle gate
    "q_dup_clusters_inc", "q_dup_clusters_inc_sql")

  /** Bench-only queries: timed alongside `headline` but NOT part of the
    * Verify/oracle catalog (their correctness is spec-pinned, not
    * DuckDB-replayable). Currently the XXH64 production dedup-signature
    * spellings whose registered twins are md5 audit formulations —
    * keeping the production kernels performance-tracked (ADVICE r18)
    * without growing the no-oracle class.
    */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    TextQueries.benchOnly

  /** What Bench times: the headline set plus the bench-only spellings. */
  def benchHeadline: Seq[String] = headline ++ benchOnly.keys.toSeq.sorted
}
