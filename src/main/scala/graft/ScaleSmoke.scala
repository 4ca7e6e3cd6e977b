package graft


import org.apache.spark.sql.functions._

/** Nx scale-up smoke: materializes a documents table Nx the given SF
  * (shifted-id copies), then times the linear per-document operators on
  * it. Prints one JSON line {query: seconds} plus the x-factor vs the
  * same queries at 1x, so scaling behavior is measured, not assumed.
  *
  * Only the per-doc (embarrassingly parallel / single-shuffle) operators
  * run here: all-pairs similarity ops on a 90%-clone corpus would
  * legitimately quadratic-blow-up on the clone groups — the documented
  * pipeline order for such corpora is exact-dedup FIRST (q_dedup_exact /
  * q_quality_filter), THEN pairwise similarity on survivors.
  *
  * Usage: runMain graft.ScaleSmoke [srcSfDir] [workDir]
  */
object ScaleSmoke {
  private val queries = Seq(
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_text_stats",
    "q_lang_quality", "q_quality_filter", "q_fingerprint", "q_vocab_topk",
    "q_tfidf_top", "q_pack_chunks", "q_sample_stratified", "q_pii_redact",
    // span-count + repetition: one corpus-wide shuffle keyed on span
    // hash / (doc, token) — the exact-substring-dedup signal at Nx
    "q_span_dedup", "q_repetition",
    // position-level repeated-gram spans + their excision transform:
    // the O(total tokens) gram exchange is the honest linear term;
    // clones plant Nx more duplicated grams, so the dup frame grows
    // Nx too (the clone corpus is the WORST case — 100% duplicated)
    "q_repeated_spans", "q_span_excise",
    // surgical decontamination: the corpus gram stream probes the
    // broadcast bench gram set map-side (the %50 bench grows with the
    // smoke corpus like q_decontaminate's, stressing the broadcast
    // beyond the fixed-benchmark reality), then doc-keyed island work
    "q_decontam_excise",
    // decontamination: corpus spans probe a broadcast of benchmark span
    // hashes map-side (in production the benchmark is FIXED size; in
    // this smoke the %50 benchmark grows with the corpus, stressing the
    // broadcast harder than reality). domain cap: rank window whose
    // cost tracks per-source counts. Both should scale ~linearly.
    "q_decontaminate", "q_domain_cap",
    // ANN at Nx corpus: the fixed query set scans an Nx candidate pool —
    // brute force is the linear baseline, LSH/IVF the sublinear paths
    "q_embed_cosine_topk", "q_embed_ann_lsh", "q_embed_ann_ivf", "q_embed_pq",
    "q_embed_ivfpq",
    // persisted-index probes at Nx: the FIRST timed run pays the
    // one-time index build (3 corpus scans — the amortized training
    // cost the operator exists to hoist out of queries); the probe
    // itself reads nprobe/nlist of the postings via partition pruning,
    // so its factor should sit well under the brute-force baseline's;
    // the SQL spelling plans the identical probe (TVF twin convention)
    "q_ann_indexed", "q_ann_indexed_pq", "q_ann_indexed_sql",
    // filtered search at Nx: the same pruned-postings probe with the
    // label predicate evaluated in the scan (PushedFilters) — selectivity
    // is clone-invariant (labels replicate with the rows), so the factor
    // should sit on q_ann_indexed's; first run pays the attr-index build
    "q_ann_filtered", "q_ann_filtered_sql",
    // guaranteed-k escalation at Nx: same pruned probe + the deficient
    // slice's aggregator-capped exact rescore — at healthy Nx corpora
    // the deficient slice is empty and the factor tracks q_ann_filtered
    "q_ann_filtered_k",
    // index maintenance at Nx: its own index build (first run, one-time)
    // plus the tombstone anti-join on the pruned postings read — the
    // probe factor should sit on q_ann_indexed's with the small
    // broadcast-anti-join constant on top
    "q_ann_index_delete",
    // staleness audit at Nx: one pruned postings scan + the flat-literal
    // nearest-cell kernel — per-cell counts are all that shuffles, so
    // the factor must track the scan (first run pays its own demo-index
    // build + retrain, the amortization pattern again)
    "q_ann_index_drift",
    // robust ingest at Nx: the one-time JSONL derivation (two linear
    // passes: to_json write + permissive parse) then the tag-domain
    // aggregate — must track the scan; the TVF spelling plans the
    // identical clean-mode read (TVF twin convention)
    "q_jsonl_ingest", "q_ingest_sql",
    // semantic dedup at Nx: clone groups all land in one cell and lose
    // to the min id — in-cell pair work is bounded by cell size (~n /
    // nlist), not corpus size; past MaxAutoNlist-cell corpora pass
    // explicit nlist ~ n/256 to keep cells constant-size
    "q_semdedup",
    // one Lloyd round at Nx vectors: linear assignment in the scan,
    // update shuffle stays k x dim regardless of corpus size
    "q_kmeans_iter",
    // MG-pruned heavy hitters: the shuffled key domain stays at
    // |partitions x k| candidates no matter how the vocabulary grows
    "q_heavy_hitters",
    // sampling tier at Nx: per-source cumsum / top-k windows whose cost
    // tracks per-source counts; hard negatives = broadcast-anchor scan
    "q_mix_sample", "q_weighted_sample", "q_hard_negatives",
    // BPE merge rounds at Nx: the corpus pays one word-frequency shuffle;
    // the per-round pair counting runs on the distinct-word vocabulary,
    // which a shifted-id clone corpus does NOT grow — wall should track
    // the single corpus scan, far below Nx
    "q_bpe_merges",
    // retrieval tier at Nx: BQ's Hamming pass is a fixed-query scan of
    // an Nx signature projection (8 B/row); BM25's tf/df frames grow
    // with corpus x vocab; bigram-LM and RRF compose the same pieces
    "q_embed_bq", "q_bm25", "q_bigram_lm", "q_hybrid_rrf",
    // incremental ingestion dedup (hash-only anti join) and int8
    // quantization (pure per-row fold) — both should track the scan
    "q_incr_dedup", "q_embed_quant",
    // tokenizer apply: training runs on the (clone-invariant) vocab,
    // encoding is the linear corpus pass — wall should track the scan
    "q_bpe_encode",
    // r7 additions: DSIR scoring is one token pass + a vocab-keyed
    // join (vocab clone-invariant, the scoring join grows with the
    // token stream); distinct-n is one tagged-gram pass; zipf cuts the
    // vocab with a map-side partial top-k; calibration is a pure
    // per-row fold into 10 bins
    "q_dsir", "q_distinct_n", "q_zipf", "q_calibration",
    // r9 additions: fuzzy decontam signatures are one corpus shingle
    // pass with broadcast bench bands (the %50 bench grows with the
    // smoke corpus, stressing the broadcast beyond reality, like
    // q_decontaminate); OOV is a broadcast-vocab probe of the token
    // stream; trunc-loss and the kNN probe are scan-shaped (the probe's
    // %100 query set also grows with the smoke corpus — production caps
    // it)
    "q_fuzzy_decontam", "q_oov_rate", "q_trunc_loss", "q_knn_label_acc",
    // Kneser-Ney: bigram TYPE table is clone-invariant, scoring join
    // grows with the stream; NDCG evals a fixed-query top-10 — both
    // should track the scan. (q_media_phash is excluded for the same
    // reason as the other pairwise ops: a 90%-clone corpus puts every
    // clone group in one band bucket — dedup-first is the documented
    // pipeline order.)
    "q_kneser_ney", "q_ndcg",
    // keyness: one token aggregate + vocab-keyed joins + rank-limit
    // window (map-side partial top-k); kappa is a pure per-row fold;
    // fertility rides the BPE-encode pass with one extra join/agg
    "q_keyness", "q_kappa", "q_fertility",
    // mutual-NN at Nx vectors: cell-confined pair scoring (in-cell work
    // linear at fixed cell size), per-side argmax as aggregates
    "q_mutual_nn",
    // burstiness: one (token, doc) aggregate + token-level moments —
    // the clone corpus multiplies df/tf per token, not the vocab
    "q_burstiness",
    // JSD matrix: vocab-keyed pair work on the (source, token) frame —
    // the clone corpus grows counts, not the vocab or the pair grid
    "q_js_divergence",
    // dup-rate triage: the exact two-level hash aggregate — the clone
    // corpus is its stress case (every group collapses 100 copies)
    "q_dup_rate",
    // event-analytics tier at Nx USERS (user ids shifted per copy, so
    // per-user history stays constant — the fleet regime; timestamps
    // unchanged, so per-day/type groups get Nx fatter, stressing the
    // type-keyed aggregates' partial-agg reduction): user-window ops
    // (streaks, gaps, attribution), the distinct-collapsing growth
    // grid, and the two inference aggregates — all should track the
    // scan, none holds per-key state that grows with the corpus
    "q_streak", "q_interarrival", "q_entropy", "q_growth_accounting",
    "q_attribution", "q_ab_test", "q_chi2",
    // second wave of the tier: user-window state (drawdown, funnel
    // delays, debounce), the distinct self-join (audience overlap),
    // lifetimes (survival), and the type-keyed series stats whose
    // per-(type, day) groups get Nx fatter
    "q_drawdown", "q_funnel_time", "q_debounce", "q_audience_overlap",
    "q_survival", "q_cusum", "q_seasonality", "q_forecast_backtest",
    "q_rolling_median", "q_theil_sen", "q_autocorr",
    // inference tier: value-grid aggregates (KS/U on the shared grid
    // domain, CUPED's per-user frame, weekly LTV) — all partial-agg
    // bound, none holds per-key state that grows with the corpus
    "q_ks_test", "q_mannwhitney", "q_cuped", "q_lag_corr", "q_cohort_ltv",
    // r11 additions — the de-interpreted kernels and the WAV roundtrip,
    // all pure per-row document passes that must track the scan:
    // linear-quality's weight fold (one md5/token via graft_weight_sum),
    // language ID (one n-char window pass via graft_lang_ngram), and
    // audio encode->decode (two linear passes per doc through the JDK
    // codec). q_bootstrap stays out: it runs on orders, which this
    // smoke does not clone — it would time a 1x table and report a
    // meaningless flat factor.
    "q_linear_quality", "q_lang_ngram", "q_audio_decode",
    // r11 second wave: mixture reweighting is one md5/doc + a
    // source-keyed integer aggregate (all weight math on the k-row
    // frame — must track the scan); the JL projection's registered body
    // is ALREADY fixed-probe at Nx (vec_id < 3 pins the probe to
    // copy 0 while the projected corpus grows Nx), so it measures the
    // production regime directly: linear projection + linear pair dots.
    // q_label_prop stays out with the other pairwise-similarity ops —
    // a 90%-clone corpus quadratically densifies its candidate graph;
    // dedup-first is the documented pipeline order.
    "q_mix_reweight", "q_embed_rp",
    // r11 third wave: the CMS counter build is one (token, count)
    // aggregate over a clone-invariant vocab (the sketch side is
    // constant-size by construction); the audio fingerprint is a pure
    // per-row WAV encode->decode->signature pass plus one sig-keyed
    // window — both must track the scan
    "q_cms_est", "q_audio_fingerprint",
    // r12: the rerank stage rides the RRF retrieval (which grows with
    // the corpus, timed above as q_hybrid_rrf); everything it ADDS —
    // the joint feature join — is candidate-proportional (|Q| x 10
    // rows, corpus semi-filtered before tokenization), so its wall
    // should track q_hybrid_rrf's with a constant on top
    "q_rerank",
    // r12: the ANN recall audit runs BOTH arms — brute force (the
    // linear baseline already timed as q_embed_cosine_topk) and IVF —
    // on a fixed 50-query probe (vec_id < 50 pins to copy 0), so its
    // wall is the sum of two already-smoked scans plus a <=500-row
    // id-set intersection
    "q_ann_eval",
    // r12: video-fingerprint dedup is the audio fingerprint's shape on
    // the AVI/DIB container — one per-row encode→walk→decode pass plus
    // one 8-byte-signature-keyed window; must track the scan
    "q_video_fingerprint",
    // r12: the NDCG close of the cascade — rerank (timed above) plus
    // 15-row label/discount arithmetic; must track q_rerank's wall
    "q_rerank_ndcg",
    // r12 fourth wave: Naive Bayes trains on a clone-invariant vocab
    // grid (the smoothing table doesn't grow with copies) while the
    // two token streams and the scoring join grow Nx — must track the
    // scan. Covariance is the pure per-row d² explode into a fixed
    // 2080-key aggregate — the textbook partial-agg shape. The
    // interval sweeps are lineitem windows whose keys (l_suppkey) are
    // NOT shifted by the clone, so rows-per-key grows Nx — the honest
    // per-key window-state stress, n log n per key. (q_setsim_prefix
    // stays out with the other pairwise-similarity ops: a 90%-clone
    // corpus quadratically densifies candidate pairs; dedup-first is
    // the documented pipeline order.)
    "q_naive_bayes", "q_embed_cov", "q_interval_coverage",
    "q_interval_overlap",
    // r12 third wave: HRW shard routing is a pure in-row argmax fold
    // (72-key aggregate crosses); the blocklist gate is a dictionary-
    // broadcast scan (|dict|-keyed partials + one counter row) — both
    // must track the scan. (q_isotonic_cal and q_record_linkage run on
    // orders/customer, which this smoke does not clone — they would
    // time 1x tables and report meaningless flat factors, the
    // q_bootstrap exclusion.)
    "q_shard_assign", "q_blocklist",
    // the production-dictionary variant: same one-AC-pass plan, 24x the
    // dictionary — per-row cost must stay flat (the kernel claim)
    "q_blocklist_240",
    // r12 fifth wave: stratified sharding is one md5/doc + the
    // (source, bucket)-windowed rank — sources stay fixed while every
    // (source, bucket) group gets Nx fatter, the per-group n log n
    // window stress at constant group COUNT. The as-of pair rides the
    // events tier (Nx users, constant per-user history): composed =
    // union + window, native = the streaming-merge exec — the factor
    // pair measures the same join both ways at Nx keys. (q_bcubed
    // stays out with the pairwise-similarity ops — it audits the
    // cluster machinery a 90%-clone corpus quadratically densifies;
    // q_bucket_join stays out because the clone shifts l_orderkey but
    // not o_orderkey, so the Nx join degenerates to the 1x result.)
    "q_shard_stratified", "q_asof_join", "q_asof_native",
    // r14: the nearest-direction native merge (same events tier, same
    // Nx-keys regime — one extra held candidate over the backward
    // merge, so its factor should track q_asof_native's), and the PIT
    // enrichment that now CONSUMES the native exec in production form
    // (scd2 window build + the merge; per-user history constant under
    // the clone, so both stages should track the scan)
    "q_asof_native_nearest", "q_pit_enrich",
    // r14 oracle-gate companion: the tolerance-bounded native merge —
    // same events tier, same held-candidate state, one extra bound
    // check per row; its factor should sit on q_asof_native's
    "q_asof_native_tol",
    // r14 second wave: the composite-key (user_id, day) native as-of —
    // same Nx-keys regime, two key components per compare
    "q_asof_native_keys",
    // r15: the remaining as-of spellings under the Nx gate. q_asof_bcast
    // broadcasts the clicks side, which the clone corpus grows Nx —
    // DELIBERATELY past the operator's dimension-size design regime
    // (its production contract), so this measures the worst honest
    // case: a ~2.5M-row broadcast + one shared per-executor index.
    // q_asof_auto re-plans per scale: broadcast at 1x (clicks under the
    // threshold), merge at Nx (stats exceed it) — the strategy rule
    // exercised at both operating points. q_asof_sql is the TVF
    // spelling of the same backward join (plans identically to auto).
    "q_asof_bcast", "q_asof_auto", "q_asof_sql",
    // r15: the other two TVF spellings — each plans its DataFrame
    // twin's exact shape (q_dedup_exact / q_embed_cosine_topk, both
    // long-standing smoke members), so the factors should sit on their
    // twins' readings — any divergence is TVF-resolution overhead, not
    // operator cost.
    "q_dedup_sql", "q_ann_sql")

  /** Relational tier at Nx orders/customers (opt-in via
    * SPARK_GRAFT_ONLY, like the graph tier): orders clone by shifted
    * o_orderkey (bins/categories are FIXED domains, so per-bin counts
    * grow Nx and the aggregate partials must absorb them); customer
    * clones shift BOTH c_custkey and c_nationkey, so the linkage
    * blocking-key domain grows Nx with per-block density constant —
    * the production regime (a fixed block domain under Nx data would
    * quadratically blow up the pair space; blocking granularity is the
    * documented scale knob, and the smoke measures the knob set
    * correctly). q_bootstrap joins this tier: its exclusion from the
    * default sweep was exactly that orders was not cloned.
    */
  /** Which relational-tier table each opt-in query reads — the clone
    * builder scales only what the selection consumes.
    */
  private val ordersConsumers =
    Set("q_isotonic_cal", "q_woe_iv", "q_bootstrap", "q_bucket_join",
      "q_compact_scan", "q_pipe_sql", "q_cdc_diff", "q_cdc_sql", "q_cdc_apply",
      "q_cdc_apply_sql", "q_mv_rewrite", "q_mv_rewrite_sql")
  private val customerConsumers = Set("q_record_linkage")

  private val relationalQueries = Seq(
    "q_isotonic_cal", "q_record_linkage", "q_woe_iv", "q_bootstrap",
    // bucketed co-located join at Nx BOTH facts: lineitem and orders
    // clone with the SAME per-copy key shift (their orderkey maxima are
    // equal at every SF), so referential integrity survives and the
    // zero-shuffle join carries Nx real matches; the first Nx run pays
    // the one-time bucketed write (the stored-layout amortization the
    // operator exists for)
    "q_bucket_join",
    // r16: compaction at Nx orders — fragment + coalesce-rewrite, both
    // linear write passes (the maintenance job's honest cost); pipe
    // syntax at Nx orders — the parser-surface twin of the broadcast
    // join + aggregate it lowers to (customer stays 1x: o_custkey is
    // unshifted, so every order still matches and per-segment groups
    // get Nx fatter)
    "q_compact_scan", "q_pipe_sql",
    // r16 continuation: the CDC snapshot diff at Nx orders — both
    // half-year snapshots grow Nx (shifted o_orderkey, o_custkey fixed:
    // per-customer groups get Nx fatter, the honest partial-agg
    // stress), then ONE full-outer join on the Nx customer domain...
    // except custkey is NOT shifted, so the join key domain stays 1x
    // with Nx-heavier aggregates feeding it — the diff itself is
    // key-domain-sized, the production shape (changes ≪ corpus); the
    // TVF spelling plans the identical diff
    "q_cdc_diff", "q_cdc_sql",
    // ...and the feed APPLIED back: state moves through one anti-join
    // against the touched keys + a union of incoming rows — must track
    // the 1x key domain like the diff itself
    "q_cdc_apply", "q_cdc_apply_sql",
    // MV rewrite at Nx orders (both spellings — the SQL twin plans the
    // identical rewritten aggregate): the first run pays the one-time summary
    // build (one corpus aggregate); the rewritten query then scans the
    // |priority x status|-sized summary — Nx-invariant by construction
    "q_mv_rewrite", "q_mv_rewrite_sql")

  /** Graph tier at Nx DISJOINT copies (lineitem cloned with both
    * l_orderkey and l_partkey shifted, so each copy is an isolated
    * component): wedge/triangle/peel work scales linearly by
    * construction — the smoke measures whether the PLANS do too. These
    * run only when named via SPARK_GRAFT_ONLY (typically with
    * SPARK_GRAFT_COPIES=10): graph work is linear in copies, so the
    * default 100x would dominate the whole sweep's wall clock.
    */
  private val graphQueries = Seq(
    "q_triangle_count", "q_clustering_coef", "q_kcore", "q_assortativity")

  /** FIXED-PROBE regime — the production claim the broadcast-probe ops
    * are designed around: the probe / benchmark / vocab side stays at
    * BASE-corpus size while the corpus grows Nx. The registered queries
    * derive both sides from one table by id modulus, so the default
    * sweep's Nx run grows the probe Nx too and measures Nx² pair work
    * production never does (r9 readings: 57x/9.9x/7.7x). These entries
    * reuse the same query bodies with the probe pinned to the base id
    * range (copy-0 ids are < step); at 1x the pin is a no-op, so the
    * factor isolates corpus growth alone. Design prediction: ~1-3x.
    */
  private val fixedProbeNames = Seq(
    "q_knn_label_acc_fixedprobe", "q_fuzzy_decontam_fixedbench",
    "q_oov_rate_fixedvocab")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft_scale_nx"
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "100").toInt
    // local-iteration filter, same contract as Verify's SPARK_GRAFT_ONLY;
    // unknown names fail fast (a typo would otherwise silently time an
    // empty set), and a filtered run also skips the fixed ivf1024 probe
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // blank-only value == unset, not "run nothing"
    only.foreach { names =>
      val unknown = names -- ScaleSmoke.queries -- ScaleSmoke.graphQueries --
        ScaleSmoke.fixedProbeNames -- ScaleSmoke.relationalQueries
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in ScaleSmoke.queries: ${unknown.mkString(",")}")
    }
    // graph + relational entries are opt-in (see their docs): the
    // default sweep excludes them, an explicit SPARK_GRAFT_ONLY
    // includes them
    val optIn = ScaleSmoke.graphQueries ++ ScaleSmoke.relationalQueries
    val queries =
      (ScaleSmoke.queries ++ ScaleSmoke.graphQueries ++
        ScaleSmoke.relationalQueries)
      .filter(q => only match {
        case Some(names) => names.contains(q)
        case None => !optIn.contains(q)
      })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // raw-copy every table file (no Spark rewrite: events must stay
    // TIMESTAMP(NANOS) so Tables' normalization applies identically),
    // then overwrite documents with the shifted-id copies.
    val dst = java.nio.file.Paths.get(work)
    java.nio.file.Files.createDirectories(dst)
    val scaled = Set("documents", "embeddings", "events", "lineitem",
      "orders", "customer")
    // raw-copy with a stale-target clear: REPLACE_EXISTING handles
    // file-over-file, but a PREVIOUS run with a different selection may
    // have left a cloned DIRECTORY at the target (e.g. a built 10x
    // orders tree where this run wants the 1x file) — copy would throw
    // DirectoryNotEmptyException
    def rawCopy(t: String): Unit = {
      val target = dst.resolve(s"$t.parquet")
      if (java.nio.file.Files.isDirectory(target))
        graft.ops.LocalFs.deleteTree(target)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"), target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    Tables.names.filterNot(scaled).foreach(rawCopy)
    def buildNx(table: String, idCol: String): (Long, Long) = {
      val df = Tables(spark, src, table)
      val step = df.agg(max(col(idCol))).head().getLong(0) + 1
      (0 until copies).map(k => df.withColumn(idCol, col(idCol) + lit(k * step)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/$table.parquet")
      // materialized row count, not the id-space size (step * copies):
      // the two diverge whenever source ids are not dense from 0
      (copies * df.count(), step)
    }
    val (nDocs, docStep) = buildNx("documents", "doc_id")
    val (_, vecStep) = buildNx("embeddings", "vec_id")
    // events: shift BOTH ids — event_id for uniqueness, user_id so the
    // population grows Nx with per-user history constant (the realistic
    // fleet regime for user-keyed windows; Nx-longer single-user
    // timelines would instead measure per-key window state growth)
    locally {
      val df = Tables(spark, src, "events")
      val eStep = df.agg(max(col("event_id"))).head().getLong(0) + 1
      val uStep = df.agg(max(col("user_id"))).head().getLong(0) + 1
      (0 until copies).map(k => df
        .withColumn("event_id", col("event_id") + lit(k * eStep))
        .withColumn("user_id", col("user_id") + lit(k * uStep)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/events.parquet")
    }

    // orders/customer clones feed ONLY the opt-in relational tier —
    // and PER TABLE: a selected query pays only the max-key jobs + Nx
    // writes of the tables it actually reads (q_bucket_join never
    // touches customer; q_record_linkage never touches orders);
    // unselected tables raw-copy the 1x files so anything incidentally
    // touching them still resolves.
    val needsOrders = queries.exists(ScaleSmoke.ordersConsumers.contains)
    val needsCustomer = queries.exists(ScaleSmoke.customerConsumers.contains)
    if (needsOrders) {
      // orders: shifted order keys, fixed bin/category domains — per-bin
      // counts grow Nx, the honest partial-aggregation stress
      buildNx("orders", "o_orderkey")
    }
    if (needsCustomer) {
      // customer: shift BOTH custkey and nationkey — the linkage blocking
      // domain grows Nx with per-block density constant (see
      // relationalQueries doc: fixed blocks under Nx data would
      // quadratically blow up the pair space by design, not by accident)
      val df = Tables(spark, src, "customer")
      val cStep = df.agg(max(col("c_custkey"))).head().getLong(0) + 1
      val nStep = df.agg(max(col("c_nationkey").cast("long")))
        .head().getLong(0) + 1
      (0 until copies).map(k => df
        .withColumn("c_custkey", col("c_custkey") + lit(k * cStep))
        .withColumn("c_nationkey",
          (col("c_nationkey") + lit(k * nStep)).cast("int")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/customer.parquet")
    }
    Seq("orders" -> needsOrders, "customer" -> needsCustomer).foreach {
      case (t, built) => if (!built) rawCopy(t)
    }

    // lineitem: shift BOTH keys so every copy is a disjoint component of
    // the co-purchase graph — graph work then scales linearly by
    // construction and the smoke isolates plan overhead (a shared key
    // space would instead quadratically densify per-part neighborhoods)
    locally {
      val df = Tables(spark, src, "lineitem")
      val okStep = df.agg(max(col("l_orderkey"))).head().getLong(0) + 1
      val pkStep = df.agg(max(col("l_partkey"))).head().getLong(0) + 1
      // q_bucket_join's Nx referential integrity rests on lineitem and
      // orders shifting by the SAME step — fail fast if a fixture ever
      // has max(l_orderkey) != max(o_orderkey) (the smoke would
      // otherwise silently time a degenerate zero-match join)
      if (needsOrders) {
        val oStep = Tables(spark, src, "orders")
          .agg(max(col("o_orderkey"))).head().getLong(0) + 1
        require(okStep == oStep,
          s"lineitem/orders clone steps diverge ($okStep vs $oStep): " +
            "the Nx bucket join would be degenerate")
      }
      (0 until copies).map(k => df
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * okStep))
        .withColumn("l_partkey", col("l_partkey") + lit(k * pkStep)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    }

    def timeAll(dir: String): Map[String, Double] = {
      Tables(spark, dir, "documents").write.format("noop").mode("overwrite").save()
      queries.map { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val at1x = timeAll(src)
    val atNx = timeAll(work)
    // IVF far past the old 128-cell literal cap: explicit nlist=1024 on
    // the Nx corpus (auto-sizing picks ~N/256 cells, which can sit below
    // 1024 at this SF) — proves thousands of centroid cells plan and run
    // through the flat-literal kernels at scale.
    val ivf1024 = if (only.nonEmpty) None else Some {
      val e = graft.Tables(spark, work, "embeddings")
      val t0 = System.nanoTime()
      graft.functions.VectorOps.ivfTopK(
        e.filter(col("vec_id") < 50), e, k = 5, nlist = 1024, nprobe = 128)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // fixed-probe entries (see fixedProbeNames doc): probe pinned to the
    // base id range, corpus grows — at 1x the pin selects exactly the
    // registered query's probe, so x1 matches the modulus form above
    val fixedProbeDefs: Map[String, String => org.apache.spark.sql.DataFrame] = Map(
      "q_knn_label_acc_fixedprobe" -> { dir =>
        val e = Tables(spark, dir, "embeddings")
        val probe = col("vec_id") < vecStep && col("vec_id") % 100 === 0
        graft.queries.TextQueries.knnLabelAccuracy(e.filter(probe), e.filter(!probe))
      },
      "q_fuzzy_decontam_fixedbench" -> { dir =>
        val d = Tables(spark, dir, "documents")
        val bench = col("doc_id") < docStep && col("doc_id") % 50 === 0
        graft.queries.TextQueries.fuzzyDecontam(d.filter(!bench), d.filter(bench))
      },
      "q_oov_rate_fixedvocab" -> { dir =>
        val d = Tables(spark, dir, "documents")
        graft.queries.TextQueries.oovRate(d, d.filter(col("doc_id") < docStep))
      })
    val fixedSelected = ScaleSmoke.fixedProbeNames
      .filter(n => only.forall(_.contains(n)))
    def timeFixed(dir: String): Map[String, Double] = fixedSelected.map { name =>
      val t0 = System.nanoTime()
      fixedProbeDefs(name)(dir).write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val fixed1x = timeFixed(src)
    val fixedNx = timeFixed(work)

    val lines = queries.map { q =>
      f""""$q":{"x1":${at1x(q)}%.3f,"xN":${atNx(q)}%.3f,"factor":${atNx(q) / at1x(q)}%.2f}"""
    } ++ fixedSelected.map { q =>
      f""""$q":{"x1":${fixed1x(q)}%.3f,"xN":${fixedNx(q)}%.3f,"factor":${fixedNx(q) / fixed1x(q)}%.2f}"""
    } ++ ivf1024.map(v => f""""ivf_nlist1024_xN":${v}%.3f""")
    println(s"""{"metric":"scale_nx","n":$copies,"docs":$nDocs,${lines.mkString(",")}}""")
    spark.stop()
  }
}
