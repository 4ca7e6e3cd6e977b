package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.{CollectLimitExec, ExpandExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExecBase, WindowGroupLimitExec}

/** Plan-regression gate over the ENTIRE query catalog: every registered
  * query's physical plan is audited for the anti-patterns past rounds
  * hunted down one at a time — all-pairs join nodes, interpreted
  * row-at-a-time Scala UDFs, Python evaluation, and static shuffle-count
  * creep. Running it in `sbt test` turns those one-off plan audits into a
  * standing invariant: a future edit that sneaks a CartesianProduct or an
  * extra exchange into any of the 99 plans fails CI, not a bench review.
  *
  * AQE is disabled while PLANNING here (runtime re-planning would hide
  * the static shape; execution never happens in this suite), and shuffle
  * counts are of the pre-AQE plan — note ReuseExchange materializes at
  * runtime, so identical self-join subtrees count each occurrence.
  */
class ExplainSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** Static shuffle-exchange budget: a SNAPSHOT of every query's current
    * count (sf0.001, AQE off — deterministic; regenerate with
    * `runMain graft.ShuffleCounts`), so a single NEW exchange in any
    * plan fails the gate. Dropping below budget is an improvement —
    * update the snapshot when it happens. Unlisted (future) queries get
    * the tight default.
    */
  private val defaultMaxShuffles = 5
  // r20 refresh: CoreOps.fanOut adds ONE explicit-count repartition
  // exchange ahead of scan-stage-heavy kernels (byte-light single-row-
  // group scans starve them to one task); the affected budgets below
  // were regenerated with ShuffleCounts and carry that +1. The exchange
  // is an identity at scale (fanOut no-ops when the source already has
  // a split per core).
  private val shuffleBudget: Map[String, Int] = Map(
    "q1_pricing_summary" -> 2, "q_anti_join" -> 1, "q_approx_distinct" -> 2,
    "q_autocorr" -> 3, "q_containment" -> 3, "q_rfm" -> 4,
    "q_skyline" -> 3, "q_streak" -> 3,
    "q_ab_test" -> 2, "q_cusum" -> 3, "q_gini" -> 2, "q_interarrival" -> 2,
    "q_seasonality" -> 3, "q_entropy" -> 3, "q_forecast_backtest" -> 3,
    "q_clustering_coef" -> 5,
    "q_tpch_q5" -> 2, "q_rolling_median" -> 3, "q_chi2" -> 5,
    "q_attribution" -> 3,
    // q_heaps: the static plan is audited post-localCheckpoint (the
    // bucket-count and decile frames are eagerly materialized), so the
    // remaining exchange is the final decile aggregate
    "q_heaps" -> 1,
    "q_drawdown" -> 2, "q_theil_sen" -> 3,
    // r16 continuation tiers: ingest (level-1 agg, multi-distinct
    // regroup over the tag domain, sort ×2 stages), its clean-mode TVF,
    // compaction scan, deleted-index probe (anti-join rides the
    // broadcast, probe top-k + sort), pipe-syntax SQL
    "q_jsonl_ingest" -> 4, "q_ingest_sql" -> 2, "q_compact_scan" -> 2,
    "q_ann_index_delete" -> 2, "q_pipe_sql" -> 2, "q_ann_index_drift" -> 2,
    // r16 continuation 2: filtered stored-index probe (query-cell
    // regroup + top-k window exchange — the label predicate rides the
    // postings SCAN, adding zero exchanges vs q_ann_indexed); the CDC
    // diff (2 snapshot aggs + output sort; the full-outer join REUSES
    // the aggs' custkey partitioning), its TVF twin, and applyFeed
    // (diff's 3 + the anti-join's regroup + union sort); Q3 at sf0.001
    // stats broadcasts orders+customer, leaving the one agg regroup
    "q_ann_filtered" -> 2, "q_ann_filtered_sql" -> 2,
    // two-arm audit by construction (exact filtered brute truth + the
    // filtered probe + the recall join/agg) — every frame (|queries|×k)
    "q_ann_filtered_eval" -> 6,
    // two lazy phases: the pruned probe (+ top-k window exchange), the
    // sufficiency counts, and the deficient-slice exact rescore — every
    // exchange (|queries| x k)-sized
    "q_ann_filtered_k" -> 4,
    "q_cdc_diff" -> 3, "q_cdc_sql" -> 3, "q_cdc_apply" -> 5,
    "q_cdc_apply_sql" -> 5,
    "q_tpch_q3" -> 1,
    // MV-rewritten: the re-aggregate over the summary + output sort —
    // the base-corpus scan is GONE from this plan by construction
    "q_mv_rewrite" -> 2, "q_mv_rewrite_sql" -> 2,
    // q_matryoshka: 4 independent brute-force top-k pipelines (full
    // truth + 3 truncated variants) at ~3 exchanges each — every frame
    // is (|queries| x k)-sized after the aggregator's map-side cap, so
    // the count is wide but each exchange is tiny
    "q_matryoshka" -> 13, "q_benford" -> 2, "q_survival" -> 4,
    "q_funnel_time" -> 3, "q_audience_overlap" -> 4, "q_debounce" -> 2,
    "q_embed_decontam" -> 2, "q_trimmed_mean" -> 3, "q_mode" -> 3,
    "q_cuped" -> 3, "q_ks_test" -> 3, "q_data_card" -> 5, "q_lag_corr" -> 4,
    "q_rbo" -> 3, "q_mannwhitney" -> 3,
    // q_dsir: token agg (both LMs in one pass), vocab-keyed scoring
    // join, per-doc agg, output sort — all narrow rows
    "q_dsir" -> 4,
    // q_distinct_n: one tagged-gram explode -> (source, n) distinct agg
    // (2-stage), |sources|x3 regroup, output sort
    "q_distinct_n" -> 4,
    "q_calibration" -> 2, "q_zipf" -> 0, "q_zorder" -> 1,
    // q_assortativity: pair build (distinct + self-join + distinct) then
    // degree/endpoint/scalar aggregates — all exchanges after the
    // checkpoint carry edge- or degree-table-sized rows, never the scan
    "q_assortativity" -> 7,
    // q_kneser_ney: bigram-type groupBy, prefix/suffix aggregates off
    // the checkpointed LM table, bigram-keyed scoring join, per-doc agg
    "q_kneser_ney" -> 5,
    // q_ndcg: the bm25Ranked subplan's exchanges + the 30-row eval agg
    "q_ndcg" -> 6,
    // q_media_phash: band self-join + pair distinct + per-media argmin
    // window, all on the checkpointed hash frame
    "q_media_phash" -> 3,
    // q_keyness: (source, token) agg, token-totals agg + keyed join off
    // the checkpointed frame, and the per-source rank-limit window
    // (WindowGroupLimit: map-side partial top-20, verified in-plan)
    "q_keyness" -> 5,
    "q_kappa" -> 2, "q_fertility" -> 3, "q_ipw" -> 2,
    // q_kcore: the static plan holds the pair build + first peel; later
    // rounds run off checkpoints (runtime jobs, not static exchanges)
    "q_kcore" -> 2, "q_bootstrap" -> 5,
    // q_mutual_nn: in-cell score join off the checkpointed assignment,
    // two per-side argmax aggregates, reciprocity joins — all on the
    // checkpointed scored frame
    "q_mutual_nn" -> 6,
    // q_burstiness: (token, doc) agg -> token moments -> top-30 cut; the
    // rank window sits above the global limit (limit-bounded, gate-clean)
    "q_burstiness" -> 3,
    // q_minhash_est: static plan holds only the post-checkpoint band
    // agg + reporting joins; shingle/signature stages are checkpointed
    "q_minhash_est" -> 4,
    // q_fuzzy_decontam: shingle/candidate stages are checkpointed; the
    // 6 static exchanges are the exact-verify agg, the two size aggs,
    // the two bench-side signature aggs (inside broadcast subtrees —
    // eval-suite-sized rows), the best-match window, and output sort;
    // the corpus-sized frame crosses an exchange exactly once
    "q_fuzzy_decontam" -> 6,
    // q_cluster_canonical: pair build runs off ngramJaccardPairs'
    // checkpoints; cluster join + one argmax groupBy + output sort
    "q_cluster_canonical" -> 3,
    // r9 snapshot: Q10's filters + broadcast dims leave ONE fact
    // exchange; spearman's two rank windows share one prio exchange;
    // Q8's eight tables reduce to the li⋈o⋈c chain (dims broadcast)
    // q_collated_join at 5: one MORE static exchange than the r9 plan,
    // but the corpus only crosses the FIRST (the binary-key partial
    // aggregate); the collated SMJ pair + regroup + sort all carry
    // |distinct event types| rows (Spark 4.1 ignores broadcast hints
    // when collate() sits INSIDE the join condition — see
    // CollationPlanSpec for the full cliff map — so keeping the raw
    // fact out of that SMJ is the whole point: 12.5 s -> sub-second)
    "q_collated_join" -> 5, "q_k_anonymity" -> 3, "q_knn_label_acc" -> 5,
    "q_lang_confusion" -> 3, "q_leakage_safe_split" -> 3, "q_oov_rate" -> 3,
    "q_spearman" -> 2, "q_tpch_q10" -> 1, "q_tpch_q8" -> 2,
    "q_trunc_loss" -> 2, "q_variant_extract" -> 2,
    // r10 snapshot: Q21's semi+anti both sort-merge on l_orderkey (one
    // fact exchange each + the l1 side's), dims broadcast, plus the
    // final agg + sort exchanges
    "q_tpch_q21" -> 5,
    // r10 snapshot, second batch: Q2's part-supplier aggregate (part
    // filter broadcast-pruned BEFORE it) + tiny regroup + output sort;
    // Q13's left join shares its c_custkey exchange with the first
    // aggregate, histogram regroup + sort on top; Q17's per-part avg
    // is the one fact exchange (rejoin broadcast) + the global agg's
    // single-partition exchange; Q18's order-quantity aggregate is the
    // only fact exchange (survivor join reuses its key, top-100 is
    // TakeOrderedAndProject); Q22: scalar-avg single-partition
    // exchange + the anti join pair; linear-quality is IN-ROW (sort
    // exchange only); token-entropy aggregates off its checkpoint
    "q_tpch_q2" -> 3, "q_tpch_q13" -> 3, "q_tpch_q17" -> 2,
    "q_tpch_q18" -> 1, "q_tpch_q22" -> 3,
    "q_linear_quality" -> 1, "q_token_entropy" -> 3,
    // r11: audio roundtrip and lang ID are in-row passes (sort exchange
    // only — the mapPartitions codec never shuffles)
    "q_audio_decode" -> 2, "q_lang_ngram" -> 1,
    // r10 snapshot, TPC-H completion batch: Q7's 6 are the three
    // keyed fact-join exchange pairs (li⋈orders, ⋈supplier-region,
    // ⋈customer-region — the canonical no-stats shape; AQE broadcasts
    // the dims at runtime); Q20's 4 are the pair aggregate + the
    // totals regroup + survivor-distinct + nothing over the raw scan
    // twice (pair frame checkpointed); Q16: anti is broadcast, so the
    // distinct two-level aggregate + sort; the single-exchange rows
    // are pure scan-aggregates (Q6/Q14/Q19)
    "q_tpch_q4" -> 2, "q_tpch_q6" -> 1, "q_tpch_q7" -> 6,
    "q_tpch_q9" -> 2, "q_tpch_q11" -> 2, "q_tpch_q12" -> 2,
    "q_tpch_q14" -> 1, "q_tpch_q15" -> 2, "q_tpch_q16" -> 3,
    "q_tpch_q19" -> 1, "q_tpch_q20" -> 4,
    // q_logreg_step: margin aggregate + doc-keyed rejoin off the
    // checkpointed (doc, bucket) frame + the 32-row bucket aggregate
    "q_logreg_step" -> 3, "q_dp_noise" -> 2,
    // r11 snapshot, new-query batch: q_mix_reweight audits
    // post-checkpoint (the corpus aggregate and the k-row weight frame
    // are eagerly materialized) — remaining are the wq total + output
    // sort; q_label_prop likewise audits the final round's tail (per-
    // round frames checkpointed), leaving the output sort; q_embed_rp's
    // 5 are the two pair-dot aggregates, the corpus-side norm
    // aggregate, its id_b rejoin, and the output sort — all carrying
    // (pair) or (vec, dim) integer partials, never raw vectors
    // q_label_prop (r18, collapsed-graph semantics): post-checkpoint
    // tail = the clone-membership inheritance join + the output sort —
    // the propagation rounds and the rep-pair build are checkpointed
    // away; both remaining exchanges carry (gid, doc_id)/(doc_id,
    // label) longs, never texts
    "q_mix_reweight" -> 2, "q_label_prop" -> 2, "q_embed_rp" -> 5,
    // q_dedup_curve: audits post-checkpoint (the corpus-sized pair
    // build is materialized away) — the 6 are the per-threshold pair
    // count, the two-level countDistinct of docs-affected, their t-join
    // pair, and the 9-row output sort; every one moves (t, id) rows
    "q_dedup_curve" -> 6,
    // q_lsh_eval: post-checkpoint tail — per-level truth count, hit
    // count (truth⋈cand), their t-join, the scalar candidate count,
    // and the 3-row sort; the shingle/signature/candidate builds are
    // materialized away
    "q_lsh_eval" -> 8,
    // q_js_divergence: token agg + per-source totals + the pair-grid
    // expansions and their full-outer token union + per-pair grid sums —
    // every exchange after the first carries (source, token) count rows
    // (vocab-sized), never the raw corpus; the pair grid itself is
    // |sources|² and broadcast
    "q_js_divergence" -> 10,
    // q_pit_enrich: scd2 version build (one user_id exchange, reused by
    // the native as-of's right-side clustering) + the purchase-side
    // exchange into AsOfJoinExec + output sort — the as-of itself adds
    // no WindowExec (pinned below in "q_pit_enrich consumes the native
    // as-of exec")
    "q_pit_enrich" -> 3,
    // r12 snapshot: q_rerank audits post-checkpoint (the whole RRF
    // retrieval subtree is materialized away) — the 4 are the two
    // candidate-id distincts feeding the doc/embedding broadcast semi
    // filters, the rerank window's q_id exchange, and the output sort;
    // every one carries candidate-sized rows (|Q| x 10), never corpus
    "q_rerank" -> 4,
    // q_ann_eval: an audit query running BOTH pipelines un-checkpointed
    // — the IVF subtree's 2 (same pair q_embed_ann_ivf snapshots), the
    // brute-force truth window, the truth⋈ivf join's two sides, and
    // the output sort; after the two rankings everything moves <=250
    // (q_id, n_id) rows
    "q_ann_eval" -> 6,
    // q_rerank_ndcg: post-checkpoint tail — the rerank branch's two
    // candidate-id distincts + its window, the two per-list NDCG
    // aggregates, and the output sort; all on <=30-row frames
    "q_rerank_ndcg" -> 6,
    // q_video_fingerprint: the AVI encode→walk→decode pass is in-row
    // (mapPartitions); only the 8-byte-signature window and the output
    // sort exchange — video bytes never cross
    "q_video_fingerprint" -> 3,
    "q_dup_rate" -> 3, "q_lsh_curve" -> 1,
    // q_cohort_ltv: 6 exchanges, but only the first (user groupBy for
    // first-seen) and the weekly value aggregate touch the raw stream;
    // cumulative + sizing run on the cohort x week domain
    "q_cohort_ltv" -> 6,
    // q_growth_accounting: 6 exchanges but only the first (the
    // (user, day) distinct) touches the raw stream; dau/wau/first-seen
    // all branch off the checkpointed activity grid
    "q_growth_accounting" -> 6,
    // q_triangle_count: the edge list and oriented-edge frames are
    // localCheckpointed (each is branched 3-4x downstream), so the 7
    // static exchanges are the degree agg, the two degree joins, the
    // wedge self-join pair, the closing-edge join, and the final count
    // reduces — every one over (id, id)-narrow rows, none over the
    // raw co-occurrence subtree twice
    "q_triangle_count" -> 7,
    "q_approx_quantile" -> 2, "q_array_agg" -> 2, "q_array_lookup" -> 1,
    "q_anomaly_mad" -> 2,
    "q_asof_join" -> 2, "q_asof_nearest" -> 2, "q_asof_tolerance" -> 2,
    "q_cohort_retention" -> 4,
    "q_bag_setops" -> 3, "q_basket_rules" -> 4,
    "q_bit_string_agg" -> 2, "q_blob_meta" -> 1,
    // q_bm25 at 6: the (q_id, doc_id) aggregate exchange is partial-
    // agged map-side (term rows shrink before shipping) and the q_id
    // window exchange carries only (q_id, doc) rows — one MORE static
    // exchange than a repartition(q_id)-shared plan, but that plan
    // ships the full term-level frame unreduced; 6 is the cheap shape
    "q_bigram_lm" -> 5, "q_bloom_semi_join" -> 1, "q_bm25" -> 6,
    "q_bpe_merges" -> 2, "q_bpe_encode" -> 2,
    "q_cond_project" -> 1, "q_corr_subquery" -> 2,
    "q_count_distinct" -> 3, "q_cube" -> 2, "q_decontaminate" -> 3,
    "q_dedup_exact" -> 2, "q_dedup_full" -> 3, "q_dedup_minhash" -> 4,
    // q_dedup_simhash (r18, md5 audit formulation — the oracle-checked
    // twin; the production path is the 1-shuffle graft_simhash64
    // kernel, spec-pinned): per-(doc, bit) vote aggregate, per-doc band
    // packing, output sort — all carrying (doc_id, b, small ints)
    "q_dedup_simhash" -> 3, "q_dim_coverage" -> 4, "q_dim_join" -> 2,
    "q_domain_cap" -> 2, "q_drift_psi" -> 5,
    "q_dup_clusters" -> 1, "q_embed_ann_ivf" -> 2,
    "q_embed_ann_lsh" -> 3, "q_embed_centroid" -> 2, "q_embed_cosine_topk" -> 2,
    // q_embed_cov: the (i, j) pair aggregate (map-side partials absorb
    // the d^2 explode) + output sort — corpus never crosses
    "q_embed_cov" -> 3,
    "q_embed_neardup" -> 2, "q_embed_pq" -> 2, "q_embed_ivfpq" -> 2,
    // q_embed_bq: 3 exchanges but only the last two touch ≤rerank·|q|
    // rows — the TopKAggregator candidate cut pays one agg exchange of
    // map-capped rows instead of a full pair-set window sort
    "q_embed_bq" -> 3, "q_pmi_top" -> 3, "q_embed_quant" -> 1,
    "q_incr_dedup" -> 3, "q_ppl_strata" -> 5,
    "q_embed_topk_agg" -> 2,
    "q_event_paths" -> 4, "q_ewma" -> 2,
    "q_except" -> 2, "q_explode_tokens" -> 3, "q_fingerprint" -> 1,
    "q_flatten_project" -> 2, "q_full_outer" -> 3, "q_funnel" -> 2,
    "q_fuzzy_match" -> 2,
    "q_gap_fill" -> 3, "q_grouping_id" -> 2, "q_grouping_sets" -> 2,
    "q_hard_negatives" -> 2, "q_heavy_hitters" -> 3,
    // two-arm composition: the BM25 arm alone is 5 (tf agg, df window,
    // corpus stats, score agg, top-k window) + union-fuse exchange +
    // ordered output — the fusion itself adds ONE exchange, not a
    // join's two
    "q_hybrid_rrf" -> 7,
    "q_histogram" -> 2, "q_integrity_check" -> 5, "q_intersect" -> 2,
    // interval sweep pair: coverage rides ONE l_suppkey fact exchange
    // for the sweep windows and both aggregates (hash(k) satisfies the
    // (k, island) clustering) + the output sort; overlap pays one MORE
    // static exchange but the corpus crosses only the FIRST (the
    // map-side-combined (k, date, delta) aggregate — measured 19.4 s
    // -> 6.0 s at the 100x smoke); its window runs over the
    // date-domain-bounded frame
    "q_interval_coverage" -> 2, "q_interval_overlap" -> 4,
    "q_interval_join" -> 2, "q_inverted_index" -> 3, "q_json_extract" -> 1,
    "q_kmeans_iter" -> 2, "q_lang_ngram" -> 1, "q_lang_quality" -> 1,
    "q_lateral_topk" -> 2,
    "q_latest_per_key" -> 2, "q_media_decode" -> 1, "q_media_frames" -> 1,
    // q_mmr_select: the registered frame is the driver-built 5-row
    // result (each greedy round ran as its own TakeOrderedAndProject
    // job at build time — no exchange); the 1 is its output sort
    "q_mmr_select" -> 1,
    "q_minmax_by" -> 2, "q_mix_sample" -> 2, "q_ms_to_date" -> 1,
    "q_ngram_jaccard" -> 3, "q_novelty" -> 3,
    // q_pagerank: per-round localCheckpoints truncate the static plan to
    // the final round's narrow shuffle — iteration cost is per-JOB
    "q_pagerank" -> 1,
    "q_pack_chunks" -> 1, "q_percentile" -> 2, "q_pii_redact" -> 1,
    "q_pivot" -> 3, "q_profile" -> 2, "q_quality_filter" -> 2,
    "q_range_join" -> 2, "q_regex_extract" -> 1, "q_repetition" -> 1,
    // gram-keyed window + doc-keyed span merge + the n_tokens join;
    // the groupBys reuse the doc partitioning
    "q_repeated_spans" -> 3,
    // same chain; at runtime AQE broadcasts the span side of the
    // excision join (measured: shuffle bytes ≈ the gram stream alone)
    "q_span_excise" -> 3,
    // contamination excision: broadcast bench probe (no gram-keyed
    // window), doc-keyed island window + span merge + the token join
    "q_decontam_excise" -> 3,
    // q_shard_stratified: the corpus crosses ONCE into the
    // (source,bkt)-windowed rank; the other five exchanges carry the
    // 256-bucket offset frame and the |sources|x|shards| cell frames
    "q_shard_stratified" -> 6,
    // q_bcubed: md5-keyed gold window + the pred join off the
    // checkpointed cluster frame, then the two-distinct final agg's
    // exchanges — everything after the checkpoints is cell-sized
    "q_bcubed" -> 6,
    // the stored twin (r19): the edge build + CC are GONE (read from the
    // persisted assignment table), but the gold window, the stored-table
    // probe join, and the same two-distinct final agg remain — six
    // exchanges, all keyed 16-byte hashes or cell-sized frames
    "q_bcubed_stored" -> 6,
    // r15: the broadcast/auto/SQL as-of spellings hold exactly ONE
    // exchange — the output orderBy; the join itself moves nothing on
    // the fact side (the zero-fact-shuffle claim, pinned). The two
    // non-as-of TVFs carry their DataFrame twins' counts.
    "q_asof_bcast" -> 1, "q_asof_auto" -> 1, "q_asof_sql" -> 1,
    "q_dedup_sql" -> 2, "q_ann_sql" -> 2,
    // q_asof_native: one exchange per side into the streaming-merge
    // AsOfJoinExec (vs the composed q_asof_join's single union-side
    // exchange — same rows cross, no union null-padding), + output sort
    "q_asof_native" -> 3, "q_asof_native_tol" -> 3,
    "q_asof_native_nearest" -> 3,
    // q_bucket_join: the POINT of the entry — bucketed scans co-locate
    // the join AND the bucket-key aggregate, so the static plan holds
    // zero shuffle exchanges end-to-end (top-k is TakeOrderedAndProject)
    "q_bucket_join" -> 0,
    // q_bucket_prune: zero exchanges — one pruned bucket scan into a
    // single-key aggregate satisfied by the bucket partitioning
    "q_bucket_prune" -> 0,
    "q_rest_scan" -> 2, "q_rollup" -> 2, "q_sample_stratified" -> 1,
    "q_scd2" -> 2,
    // q_naive_bayes: the train token stream crosses ONCE into the
    // checkpointed (lang, tok) count; the 10 static exchanges are the
    // class-total/vocab/prior aggregates, the vocab x |langs| smoothing
    // grid build, the held-out tf aggregate + its token-keyed scoring
    // join, the per-(doc, class) grid-sum, argmax window, and sort —
    // every one vocab- or per-doc-class-sized, never the raw corpus
    "q_naive_bayes" -> 10,
    // q_setsim_prefix: post-checkpoint tail (shingle index + candidate
    // pairs are materialized away) — the intersection-count join pair
    // exchanges the id-keyed shingle index once per side + the pair
    // aggregate reuses its key; output sort. Candidate-pair-sized or
    // linear index rows only, never all-pairs.
    "q_setsim_prefix" -> 3,
    "q_scalar_array" -> 1, "q_scalar_date" -> 1, "q_scalar_map" -> 1,
    "q_scalar_math" -> 1, "q_scalar_string" -> 1, "q_semdedup" -> 3,
    "q_semi_join" -> 1,
    "q_seq_pack" -> 2, "q_session_window" -> 2, "q_sessionize" -> 2,
    "q_sketch_merge" -> 3, "q_skew_salted_join" -> 2, "q_sliding_window" -> 2,
    "q_weighted_sample" -> 2,
    "q_sort_multi" -> 0, "q_span_dedup" -> 3, "q_sql_shipping_priority" -> 1,
    "q_stats_agg" -> 2,
    "q_star_join" -> 2, "q_status_filter" -> 2, "q_text_stats" -> 1,
    "q_tfidf_top" -> 5, "q_topk" -> 0, "q_tumbling_window" -> 2,
    "q_unigram_lm" -> 3,
    "q_union_distinct_limit" -> 1, "q_union_drift" -> 1, "q_unpivot" -> 1,
    "q_vocab_topk" -> 1, "q_window_lag" -> 2, "q_window_ntile" -> 2,
    "q_window_range" -> 2, "q_window_rank" -> 2, "q_window_running" -> 2,
    "q_winnow" -> 1)

  /** Unpartitioned-window gate (round-7 addition): an empty-partition-
    * spec WindowExec serializes its whole input through ONE task — the
    * exact shape that shipped silently in round 6's q_heaps/q_rbo
    * (correct at sf0.1, single-task at 100 TB). Any such node now fails
    * the audit unless (a) its subtree contains a global limit /
    * TakeOrderedAndProject — the frame is bounded by construction — or
    * (b) the query is listed here with a one-line justification that
    * the window's input domain is bounded regardless of corpus size.
    * Growing this map is a REVIEWED act: a new entry must name the
    * bound, not just claim one.
    */
  private val unpartitionedWindowAllow: Map[String, String] = Map(
    "q_survival" -> "runs on the |distinct user lifetimes| frame, <= |days| rows (calendar-bounded)",
    "q_growth_accounting" -> "cumulative users over the |days|-sized daily activity grid (calendar-bounded)",
    "q_skyline" -> "running max over the |distinct retail prices| frame (generator-bounded price domain)",
    "q_benford" -> "share-of-total over the 9-row first-digit frame",
    "q_drift_psi" -> "reference share over the |n_chars/100| histogram-bucket frame (doc-length-bounded)")

  /** Expand gate (round-9 addition): an ExpandExec multiplies its input
    * stream BEFORE the shuffle — the multi-distinct rewrite does this to
    * the raw scan (q_distinct_n once shipped a doubled gram stream this
    * way; the two-level-aggregate shape computes the same answer without
    * it). Expand is only legitimate where multiplication IS the
    * semantics — grouping sets / rollup / cube / unpivot — so any other
    * query planning one fails the audit unless justified here with the
    * bound on what gets multiplied.
    */
  private val expandAllow: Map[String, String] = Map(
    "q_cube" -> "cube() — 4 grouping sets over the aggregate, the operator's definition",
    "q_rollup" -> "rollup() — hierarchy grouping sets, the operator's definition",
    "q_grouping_sets" -> "explicit GROUPING SETS, the operator's definition",
    "q_grouping_id" -> "grouping_id() over cube grouping sets, the operator's definition",
    "q_unpivot" -> "unpivot replicates each row per measure column — the operator's definition",
    "q_sliding_window" -> "window(ts, 1h, 30m) replicates each event per overlapping window — window/slide = 2 copies, the operator's definition",
    "q_profile" -> "single-pass multi-column profile: one Expand over the 3-row summary domain",
    "q_data_card" -> "one-row corpus summary: multi-distinct over per-doc stats",
    "q_bcubed" -> "two-distinct count over the CHECKPOINTED (c,g) contingency frame — bounded by non-empty cluster intersections, never the corpus",
    "q_bcubed_stored" -> "same two-distinct final agg as q_bcubed over the same cell-sized contingency frame; the stored assignment table replaces the edge build upstream",
    "q_jsonl_ingest" -> "two-distinct count over the per-(status, lang, source) pre-aggregate — bounded by the tag domain (the raw line stream combines map-side below it), never the corpus",
    "q_mv_rewrite_rollup" -> "rollup() REWRITTEN onto the summary: the Expand multiplies the |priority x status|-sized summary scan (the MV rewrite's whole point), never the fact corpus",
    "q_mv_rewrite_gsets" -> "explicit GROUPING SETS rewritten onto the summary — same keys-sized Expand as q_mv_rewrite_rollup")

  /** A window frame is bounded-by-construction when a global limit sits
    * below it in the same subtree (TakeOrderedAndProject / GlobalLimit /
    * CollectLimit cap the row count at a plan-time literal).
    */
  private def limitBounded(p: SparkPlan): Boolean =
    p.exists {
      case _: GlobalLimitExec | _: CollectLimitExec | _: TakeOrderedAndProjectExec => true
      case _ => false
    }

  /** Queries whose plans contained an unpartitioned, non-limit-bounded
    * window in the last audit() run — compared against the allowlist so
    * a stale justification (query fixed, entry left behind) also fails.
    */
  private val sawUnpartWindow = scala.collection.mutable.Set.empty[String]
  private val sawExpand = scala.collection.mutable.Set.empty[String]

  private def audit(): Seq[String] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // benchOnly spellings run in Bench, so their plans are held to the
      // same hygiene bars as the registered catalog
      (SparkEntry.queries ++ SparkEntry.benchOnly)
        .toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val nodes = plan.collectWithSubqueries { case n => n }
        val cartesian = nodes.collect { case c: CartesianProductExec => c }
        val pythonNodes = nodes.filter(_.getClass.getSimpleName.contains("Python"))
        val scalaUdfs = nodes.flatMap(_.expressions.flatMap(_.collect {
          case u: ScalaUDF => u
        }))
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val budget = shuffleBudget.getOrElse(name, defaultMaxShuffles)
        val unpartWindows = nodes.collect {
          case w: WindowExecBase if w.partitionSpec.isEmpty && !limitBounded(w.child) => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !limitBounded(w.child) => w
        }
        if (unpartWindows.nonEmpty) sawUnpartWindow += name
        val expands = nodes.collect { case e: ExpandExec => e }
        if (expands.nonEmpty) sawExpand += name
        Seq(
          if (expands.nonEmpty && !expandAllow.contains(name))
            Some(s"$name: ExpandExec multiplies the pre-shuffle stream " +
              "(use a two-level aggregate, or justify the bound in expandAllow)")
          else None,
          if (unpartWindows.nonEmpty && !unpartitionedWindowAllow.contains(name))
            Some(s"$name: unpartitioned ${unpartWindows.head.nodeName} over an " +
              "unbounded frame (single-task at scale; fix the plan or justify in the allowlist)")
          else None,
          if (cartesian.nonEmpty) Some(s"$name: CartesianProduct in plan") else None,
          if (pythonNodes.nonEmpty)
            Some(s"$name: Python evaluation node ${pythonNodes.head.nodeName}") else None,
          if (scalaUdfs.nonEmpty)
            Some(s"$name: interpreted Scala UDF ${scalaUdfs.head.udfName.getOrElse("?")}") else None,
          if (shuffles > budget)
            Some(s"$name: $shuffles shuffle exchanges (budget $budget)") else None
        ).flatten
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_pit_enrich consumes the native as-of exec (no as-of WindowExec)") {
    // the production consumer of plans/NativeAsOfJoin: the plan must
    // hold the streaming-merge exec, and the ONLY WindowExec nodes left
    // are the scd2 version build's own two (lag + cumulative sum) — the
    // as-of stage, previously a third WindowExec buffering every user's
    // full event group, is gone
    // static plan, like audit(): AdaptiveSparkPlanExec hides its input
    // plan from collect until execution
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q_pit_enrich")(spark, sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val nodes = plan.collectWithSubqueries { case n => n }
    assert(nodes.count(_.isInstanceOf[graft.plans.AsOfJoinExec]) == 1,
      plan.toString)
    assert(nodes.count(_.isInstanceOf[WindowExecBase]) == 2, plan.toString)
  }

  test("q_recursive_cal recursion never rescans the corpus") {
    // the r15-flagged 12 s cost was the bounds VIEW joined inside the
    // recursive step — every monthly round re-ran the orders min/max
    // aggregate. With literal bounds, the WHOLE plan scans orders
    // exactly once (the monthly rollup); the ~80 recursion rounds are
    // LocalRelation steps. This pins the single-scan bound so a
    // regression back into per-round corpus scans cannot land silently.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q_recursive_cal")(spark, sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val scans = plan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    assert(scans.count(_.contains("orders.parquet")) == 1, scans.mkString("\n"))
    assert(scans.size == 1, scans.mkString("\n"))
  }

  test("no query plans a CartesianProduct, UDF, Python eval, or over-budget shuffles") {
    val violations = audit()
    assert(violations.isEmpty, violations.mkString("\n  ", "\n  ", ""))
    val stale = unpartitionedWindowAllow.keySet -- sawUnpartWindow
    assert(stale.isEmpty,
      s"stale unpartitioned-window allowlist entries (query no longer plans one): $stale")
    val staleExpand = expandAllow.keySet -- sawExpand
    assert(staleExpand.isEmpty,
      s"stale Expand allowlist entries (query no longer plans one): $staleExpand")
  }
}
