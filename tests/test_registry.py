"""Registry-ordering invariants for the driver's 50-query window.

The external driver verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` (CORRECTNESS_r01 stopped at exactly 50,
in registration order). DRIVER_PRIORITY pins the head ordering; these
tests assert the head keeps covering every SURVEY §2 + Tier C component
so no component silently falls out of the driver's correctness window.
"""

from __future__ import annotations

from mysql2parquet_spark.queries import (
    DRIVER_PRIORITY,
    REGISTRY,
    all_oracles,
    all_queries,
)

all_queries()  # trigger lazy module load so REGISTRY is populated

# component -> queries that evidence it; at least one must sit in the head.
COMPONENT_EVIDENCE = {
    "B1_scan": ["scan_project"],
    "B4_expr": ["expr_arith"],
    "B5_filter": ["filter_pred", "filter_like"],
    # join_multiway's chain is inner equi-joins with broadcast dims
    # (plan-asserted in test_plans.py::test_multiway_join_broadcasts_dims),
    # so it legitimately evidences B6/B7 while join_inner/join_broadcast
    # rotate out after three green rounds.
    "B6_inner_join": ["join_inner", "join_multiway"],
    "B7_broadcast_join": ["join_broadcast", "join_multiway"],
    "B8_outer_join": ["join_left", "join_full"],
    "B9_semi_anti": ["join_semi", "join_anti"],
    "B10_range_join": ["join_range"],
    "B11_multiway": ["join_multiway"],
    "asof_join": ["join_asof"],
    "B12_hash_agg": ["agg_group", "agg_percentile", "agg_stats", "agg_pivot", "agg_corr", "agg_salted"],
    "B13_distinct": ["agg_distinct", "agg_approx_distinct"],
    "B14_rollup": ["agg_rollup", "agg_cube", "agg_grouping_sets"],
    "B15_having": ["agg_having"],
    "B16_window_rank": ["window_rank", "window_percent"],
    "B17_window_analytic": ["window_lag", "window_analytic"],
    "B18_window_frames": ["window_running", "window_range_frame"],
    "B19_sort": ["sort_nulls"],
    "B20_limit": ["sort_limit_topk", "sort_limit_offset"],
    "B21_set_ops": ["set_ops"],
    "B22_string": ["str_funcs", "text_normalize"],
    "B23_datetime": ["date_funcs", "date_parts"],
    "B24_math": ["math_funcs"],
    "B25_conditional": ["cond_funcs"],
    "B27_json": ["json_funcs", "json_struct"],
    "B28_array": ["array_funcs"],
    "B29_subquery": ["subquery_scalar", "subquery_cte", "subquery_recursive"],
    "B30_udf": ["udf_pandas", "udf_grouped"],
    "B32_tumbling": [
        "stream_tumbling_batch",
        "stream_sliding_batch",
        "stream_rollup_batch",
    ],
    "B33_session": ["stream_session_batch"],
    "B35_stateful_dedup": ["stream_dedup_batch"],
    "C1_exact_dedup": ["dedup_exact", "dedup_fingerprint"],
    "C2_near_dedup": [
        "dedup_minhash",
        "dedup_simhash",
        "dedup_minhash_verified",
        "dedup_ngram_jaccard",
        "dedup_embedding",
    ],
    "C3_similarity": [
        "topk_similarity",
        "ann_ivf_topk",
        "ann_ivf_persisted",
        "embedding_centroids",
        "ann_lsh_topk",
        "embedding_project",
        "similarity_pairs",
        "similarity_pairs_blocked",
    ],
    "C4_text": [
        "text_quality",
        "text_langid",
        "text_bm25",
        "text_top_terms",
        "text_repetition",
        "text_normalize",
        "text_stats",
        "text_termfreq",
        "text_tokens",
        "text_tokens_regex",
        "text_fingerprint_winnow",
    ],
    "C5_multimodal": ["multimodal_binary", "multimodal_frames"],
    "C6_scale": ["sample_split", "pipeline_curate", "sample_stratified", "pipeline_shuffle"],
    "merge_cdc": ["merge_upsert"],
    "corpus_shuffle": ["pipeline_shuffle"],
    "pii_redaction": ["text_pii"],
    "B31_stream_static_enrich": ["stream_enrich_batch"],
    "pipeline_pack": ["pipeline_pack"],
    "pipeline_decontaminate": ["pipeline_decontaminate"],
    "pipeline_chunk": ["pipeline_chunk"],
    "embedding_quantize": ["embedding_quantize"],
    "tpch_composites": [
        "tpch_q1",
        "tpch_q6",
        "tpch_q3_shape",
        "tpch_q5_shape",
        "tpch_q10_shape",
        "tpch_q18",
    ],
    # r7-registered surfaces (the thawed staged cohort, VERDICT r6 ask #3)
    "drift_detection": ["drift_psi"],
    "skew_profiling": ["skew_profile", "join_explosion"],
    "kmv_bloom_sketches": ["sketch_kmv_overlap", "sketch_bloom_probe"],
    "group_disjoint_splits": ["sample_split_group"],
    "anomaly_flagging": ["events_anomaly"],
    "timeseries_resample": ["events_resample", "events_ohlc"],
    "corpus_analytics": ["text_pmi", "events_transitions"],
    "knn_classify": ["knn_classify"],
    "substring_dedup": ["dedup_substring"],
    "graph_cc": ["dedup_cluster_cc"],
    "tpch_full_suite": [
        "tpch_q2_shape", "tpch_q4_shape", "tpch_q7_shape", "tpch_q8_shape",
        "tpch_q9_shape", "tpch_q11_shape", "tpch_q12_shape",
        "tpch_q13_shape", "tpch_q14_shape", "tpch_q15_shape",
        "tpch_q16_shape", "tpch_q17_shape", "tpch_q19_shape",
        "tpch_q20_shape", "tpch_q21_shape", "tpch_q22_shape",
    ],
    # r5-added surfaces (VERDICT r5 ask #1: every one adjudicated in r6)
    "scd2_history": ["cdc_scd2", "cdc_scd2_asof"],
    "incremental_dedup": ["dedup_incremental"],
    "funnel_retention": ["events_funnel", "events_retention"],
    "fuzzy_linkage": ["fuzzy_name_pairs"],
    "corpus_mixing": ["pipeline_mix"],
    "constraints_audit": ["quality_report"],
    "incremental_rollup": ["rollup_incremental"],
    "samplers": ["sample_topn_group", "sample_weighted_rows", "sample_stratified"],
    "sketches": ["sketch_hll_rollup", "sketch_cms_freq", "sketch_histogram_q"],
}


def test_priority_names_registered():
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"


def test_priority_fits_driver_window():
    assert len(DRIVER_PRIORITY) <= 50
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY)


def test_head_order_is_priority():
    head = list(all_queries())[: len(DRIVER_PRIORITY)]
    assert head == list(DRIVER_PRIORITY)


def _thrice_proven() -> set[str]:
    """Queries with >=3 hash-green driver rows across CORRECTNESS_r*.json.

    Proven-component rule (r5): a component may vacate ALL its head slots
    only when one of its evidence queries is thrice-proven externally —
    the rotation program (VERDICT r4 ask #2) needs every never-checked
    query in the head at once, and a 4x-green agg_distinct guards B13
    better than a fifth redundant row would. Unproven components must
    still hold a head slot every round.
    """
    import glob
    import json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    greens: dict[str, int] = {}
    for f in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        with open(f) as fh:
            for n, rec in json.load(fh).items():
                if rec.get("hash_match"):
                    greens[n] = greens.get(n, 0) + 1
    return {n for n, c in greens.items() if c >= 3}


def test_every_component_in_driver_window():
    window = set(list(all_queries())[:50])
    proven = _thrice_proven()
    uncovered = {
        comp: ev
        for comp, ev in COMPONENT_EVIDENCE.items()
        if not any(q in window for q in ev)
        and not any(q in proven for q in ev)
    }
    assert not uncovered, f"components outside driver window: {uncovered}"


def test_head_queries_have_oracles_where_expected():
    # Every head query except declared rows-only ones must ship an oracle.
    oracles = all_oracles()
    missing = [
        n
        for n in DRIVER_PRIORITY
        if n not in oracles and REGISTRY[n].oracle is None and n not in ROWS_ONLY_OK
    ]
    assert not missing, f"head queries missing oracles: {missing}"


# Queries allowed to be rows-only in the head (approximate / non-SQL ops).
ROWS_ONLY_OK = {
    "dedup_minhash",
    "dedup_simhash",
    "dedup_minhash_verified",
    "dedup_minhash_cc",
    "dedup_minhash_ml",
    "ann_ivf_topk",
    "ann_ivf_persisted",
    "ann_lsh_topk",
    "embedding_project",
    "agg_approx_distinct",
    "multimodal_binary",
    "multimodal_frames",
    "text_fingerprint_winnow",
    "sketch_hll_rollup",
    "sketch_cms_freq",
    # approximate by construction: band-collision candidates (no exact
    # SQL equivalent; quality gated by tests/test_dedup.py)
    "dedup_minhash_incremental",
    # approx_percentile is approximate by contract (driver adjudicates
    # rows-only; exact-percentile parity lives in the local pytest gate)
    "agg_approx_percentile",
    # r9 debuts that are rows-only by nature: BPE token ids depend on
    # the learned merge order (trainer proven bit-equal to a pure-Python
    # reference in tests/test_bpe.py); PQ top-k is approximate by
    # construction (recall gated in tests/test_pq.py)
    "text_bpe_tokens",
    "ann_pq_topk",
    # r10 debuts that are rows-only by nature: the persisted-PQ probe
    # serves approximate top-k from trained codes (round-trip parity +
    # zero-training-job pin in tests/test_pq.py); learned-codebook
    # SemDeDup assigns cells by float argmax (survivor invariant in
    # tests/test_semantic_ivf.py)
    "ann_pq_persisted",
    "dedup_semantic_ivf",
    # r11 debut (r10-added): approx-HLL profile face — n_distinct is
    # an estimate by construction; error bound vs the exact face gated
    # in tests/test_curation_profile_dp.py (VERDICT r9 ask #6)
    "table_profile_approx",
    # r12 debut (r11-added): k-center greedy coreset — iterative
    # argmax selection, not SQL-expressible; bit-exact Python twin +
    # partitioning-independence pins in tests/test_kcenter.py
    "sample_kcenter",
    # r13 debut (r12-added): plan-driven minhash dedup — approximate
    # (LSH banding) like the rest of the minhash family; the
    # plan→parameter wiring and recall/cost frontier are pinned in
    # tests/test_soft_lsh_plan.py
    "dedup_minhash_planned",
}


def test_registry_count_is_planned():
    """Registration ledger pin: r6 froze the registry at 119 to drain the
    adjudication backlog; the r7 thaw moved the 30 staged, parity-proven
    (query, oracle) pairs in (VERDICT r6 ask #3) — 149, all 30 debuts
    holding head slots — then r7 added the incremental near-dup pair
    (dedup_jaccard_incremental, dedup_minhash_incremental; r8 debuts
    via NEXT_ROUND_BACKLOG) = 151, the D26-D28 debuts (join_strategy,
    join_bloom_prune, join_interval, privacy_kanon) = 155, the
    D29-D32 surfaces (events_winsorize, events_paths, dedup_semantic,
    pipeline_curriculum — r8 head debuts) = 159, and the r8-added
    D33/D34 pair (events_estimate, events_heavy_hitters — r9 debuts
    via NEXT_ROUND_BACKLOG) = 161, and the D35 BPE surface
    (text_bpe_tokens, rows-only by nature — r9 debut via
    NEXT_ROUND_BACKLOG) = 162, and the D37 PQ surface (ann_pq_topk,
    rows-only by nature — r9 debut via NEXT_ROUND_BACKLOG) = 163, and
    the r9-added scale-path pair (ann_pq_persisted — D37 persisted
    codes+codebook probe, VERDICT r8 ask #5; dedup_semantic_ivf — D31
    learned-codebook SemDeDup, ask #4; both rows-only by nature, r10
    debuts via NEXT_ROUND_BACKLOG) = 165, and the r9-added D38/D39/D40
    surfaces (dedup_keep_best — quality-aware cluster resolution;
    table_profile — one-pass column profiler; privacy_dp_counts —
    discrete-Laplace DP count release; all three with exact DuckDB
    oracles, r10 debuts via NEXT_ROUND_BACKLOG) = 168, and the D41
    surface (dedup_cluster_incremental — incremental connected
    components vs the full-recompute closure oracle, r10 debut via
    NEXT_ROUND_BACKLOG) = 169, and the D42/D43 pair (score_calibrate —
    cross-source quantile calibration; similarity_tfidf — sparse
    TF-IDF top-k via inverted index with integer-quantized weights;
    both exact oracles, r10 debuts via NEXT_ROUND_BACKLOG) = 171, and
    the D44 surface (pipeline_temperature — temperature-based domain
    mixing with integer-grid keep probabilities, exact oracle, r10
    debut via NEXT_ROUND_BACKLOG) = 172, and the r10-added D45 surface
    (score_calibrate_global — exact global percent_rank via
    range-partitioned two-pass rank, the scalable face of ungrouped
    calibration per VERDICT r9 What's-wrong #3; exact PERCENT_RANK
    oracle, r11 debut via NEXT_ROUND_BACKLOG) = 173, and the D39
    approx face (table_profile_approx — the 100 TB default HLL
    cardinality path, rows-only by construction per VERDICT r9 ask #6,
    error-bound-gated vs the exact profile in
    tests/test_curation_profile_dp.py; r11 debut via
    NEXT_ROUND_BACKLOG) = 174, and the r10-added D46 surface
    (sample_quota — exact-total largest-remainder integer quota
    sampling, the deterministic exact-count counterpart of D44's
    Bernoulli temperature mixing; exact oracle, r11 debut via
    NEXT_ROUND_BACKLOG) = 175, and the r10-added D47 surface
    (multimodal_phash_dedup — DCT perceptual-hash image near-dup over
    a planted-cluster synthetic BMP corpus whose ground truth is
    SQL-expressible, so the whole decode→DCT→hash→dedup pipeline is
    exactly-oracle-checked; r11 debut via NEXT_ROUND_BACKLOG) = 176,
    and the r10-added D48 surface (text_lm_score — bigram-LM
    cross-entropy quality scoring, CCNet-style; log-probs quantized to
    integer micro-nats for order-independent sums, exact oracle, pure-
    Python reference twin in tests/test_lm.py; r11 debut via
    NEXT_ROUND_BACKLOG) = 177, and the r10-added D49 surface
    (dedup_containment — exact n-gram containment pairs over the
    inverted gram index, the near-subset/quote detector resemblance
    misses; exact set-algebra oracle, r11 debut via
    NEXT_ROUND_BACKLOG) = 178, and the r10-added D50 surface
    (dedup_segments — corpus-frequent segment removal, the
    C4/RefinedWeb line dedup: global segment counts ban boilerplate,
    survivors reassemble in order; exact oracle incl. the ordered
    reassembly, Python reference twin in tests/test_segments.py; r11
    debut via NEXT_ROUND_BACKLOG) = 179, and the r10-added D51 surface
    (pipeline_dsir — DSIR importance selection, Xie et al. 2023:
    hashed-unigram log-likelihood ratios under target-vs-raw bag
    models, integer micro-nat exact; exact oracle, Python reference
    twin in tests/test_dsir.py; r11 debut via NEXT_ROUND_BACKLOG)
    = 180, and the r10-added D52 surface (text_gopher_rules — the
    Gopher/MassiveText word-level quality-rule vector, each rule an
    auditable boolean, keep = conjunction, floor-quantized ratios for
    engine-exact ties; exact oracle, Python reference twin in
    tests/test_gopher.py; r11 debut via NEXT_ROUND_BACKLOG) = 181,
    and the r10-added D53 surface (dedup_cdc_chunks — content-defined
    chunking chunk-level dup report: md5-boundary word chunks that
    resync after prepend/insert edits, per-doc dup ratios; exact
    oracle incl. the window prefix sum, Python reference twin in
    tests/test_cdc.py; r11 debut via NEXT_ROUND_BACKLOG) = 182, and
    the r10-added D54 surface (pipeline_length_buckets —
    length-bucketed batch assignment + padding-waste report: sorted
    batching with a sharded window so the modal bucket never funnels
    through one task; exact all-integer oracle, waste-reduction gate
    in tests/test_length_buckets.py; r11 debut via
    NEXT_ROUND_BACKLOG) = 183, and the r10-added D55 surface
    (multimodal_audio_trim — energy-based audio silence trim / VAD
    over binary WAV columns, planted-silence synthesis makes the full
    encode→decode→RMS→trim pipeline exactly oracle-checkable; unit
    pins in tests/test_audio_vad.py; r11 debut via
    NEXT_ROUND_BACKLOG) = 184, and the r10-added D56 surface
    (events_bootstrap — one-pass Poisson bootstrap CIs, Chamandy et
    al. 2012: 32 content-addressed Poisson(1) weights per row, every
    replica mean in ONE aggregate; exact oracle incl. the quantized
    inverse-CDF weights, Python reference twin in
    tests/test_bootstrap.py; r11 debut via NEXT_ROUND_BACKLOG) = 185.
    Bumping this count again requires a matching rotation plan (head
    slot in the debut round or an explicit NEXT_ROUND_BACKLOG entry)
    — see test_rotation_ledger_current. The r10-added D57 surface
    (sample_weighted_k — Efraimidis-Spirakis A-ES exact-size weighted
    sampling without replacement, ln(u)/weight top-k on
    content-addressed uniforms; exact oracle, Python reference twin
    in tests/test_aes_sample.py; r11 debut via NEXT_ROUND_BACKLOG)
    makes 186, and the r10-added D58 surface (dedup_cluster_density —
    per-cluster structure report over the exact trigram-Jaccard pair
    graph: wedges/triangles/clustering via the compact-forward
    triangle join, the star-vs-clique curation diagnostic; exact
    oracle incl. the recursive-closure components, itertools
    reference twin in tests/test_triangles.py; r11 debut via
    NEXT_ROUND_BACKLOG) makes 187, and the r10-added D59 surface
    (search_rrf_fusion — reciprocal-rank fusion, Cormack et al. 2009:
    rank-only combining of bounded top-k lists with integer-quantized
    reciprocals; exact oracle, Python reference twin in
    tests/test_rrf.py; r11 debut via NEXT_ROUND_BACKLOG) makes 188,
    and the r10-added D60 surface (dedup_segments_within —
    within-document repeated-segment removal, first occurrence kept,
    group-min keeper + ordered reassembly, no corpus statistic; exact
    oracle, Python reference twin in tests/test_within_dedup.py; r11
    debut via NEXT_ROUND_BACKLOG) makes 189, and the r10-added D61
    surface (agg_quantiles_global — exact global quantiles via
    range-partition rank selection, the true-order-statistic
    counterpart of approx_percentile with no single-task sort; exact
    ROW_NUMBER oracle, sorted-Python twin in
    tests/test_quantiles_global.py; r11 debut via NEXT_ROUND_BACKLOG)
    makes 190. The r11-added D62 pair (dedup_spans +
    dedup_spans_trim — maximal duplicated-span report with trim
    offsets and the all-occurrence span-removal face, the Lee et al.
    2021 ExactSubstr approximation closing VERDICT r10 ask #4; exact
    gaps-and-islands / covered-position oracles, Python twins in
    tests/test_spans.py; r12 debuts via NEXT_ROUND_BACKLOG) makes
    192. The r11-added D63/D64/D65 text-diagnostic trio
    (text_novelty — per-doc n-gram novelty, the corpus-internal RAVEN
    metric; text_entropy — character entropy with order-independent
    micro-nat sums; text_zipf — rank-frequency report with a
    quantized log-log slope; exact oracles + Python twins in
    tests/test_novelty.py / test_entropy.py / test_zipf.py; r12
    debuts via NEXT_ROUND_BACKLOG) makes 195. The r11-added D66/D67
    pair (dedup_source_overlap — cross-source fingerprint overlap
    matrix, the WIMBD/C4-audit measure; embedding_health — per-label
    anisotropy/concentration report; exact oracles + Python twins in
    tests/test_source_overlap.py / test_embedding_health.py; r12
    debuts via NEXT_ROUND_BACKLOG) makes 197. The r11-added D68/D69
    pair (sample_kcenter — k-center greedy coreset selection,
    rows-only by nature with a bit-exact Python twin in
    tests/test_kcenter.py; text_hashed_features — the hashing trick
    with signed sums, exact all-integer oracle + hashlib twin in
    tests/test_hashed_features.py; r12 debuts via
    NEXT_ROUND_BACKLOG) makes 199. The r11-added D70 surface
    (events_trimmed_mean — per-group Tukey trimmed mean with
    DECIMAL-exact kept sums, the drop counterpart of D29's winsorize
    clamp; exact oracle + Decimal twin in tests/test_trimmed_mean.py;
    r12 debut via NEXT_ROUND_BACKLOG) makes 200. The r11-added D71
    surface (pipeline_decontaminate_spans — span-level benchmark
    decontamination, the surgical cut-the-leak alternative to D16's
    document flag; exact oracle incl. ordered reassembly + Python
    twin in tests/test_decontaminate_spans.py; r12 debut via
    NEXT_ROUND_BACKLOG) makes 201. The r11-added D72/D73 pair
    (text_heaps — Heaps'-law vocabulary-growth curve with a quantized
    exponent fit, the corpus-saturation trend; pipeline_token_budget
    — data-constrained token-budget water-filling with an exact
    integer waterline; exact oracles + Python twins in
    tests/test_heaps.py / test_token_budget.py; r12 debuts via
    NEXT_ROUND_BACKLOG) makes 203. The r11-added D74 pair
    (dedup_soft_weights — SoftDeDup reweighting, copies kept at 1/n
    weight on the bow fingerprint; dedup_lsh_plan — data-driven LSH
    (b, r) planner with bit-exact chain-power S-curve sums; exact
    oracles + Python twins in tests/test_soft_lsh_plan.py; r12
    debuts via NEXT_ROUND_BACKLOG) makes 205. The r12-added D75
    surface (text_classifier_nb — the fastText-style trained quality
    classifier, Brown et al. 2020 Appendix A / Joulin et al. 2016:
    closed-form multinomial Naive Bayes over the D51 hashed-unigram
    space, log-odds + prior quantized to integer micro-nats so the
    keep/drop decision hash-adjudicates; exact oracle + Python twin
    in tests/test_classifier.py; r13 debut via NEXT_ROUND_BACKLOG)
    makes 206. The r12-added D76 surface (text_lm3_score — trigram
    STUPID-BACKOFF cross-entropy, Brants et al. 2007: trigram MLE,
    else alpha·bigram MLE, else alpha²·add-1 unigram floor; trained on
    the src1/src3 split so all three levels fire; per-trigram ln S
    quantized to integer micro-nats with operator-for-operator
    mirrored float trees, exact oracle + Python twin in
    tests/test_lm3.py; r13 debut via NEXT_ROUND_BACKLOG) makes 207.
    The r12-added D77 surface (text_winnow_words — word-level
    winnowing fingerprints, Schleimer/Wilkerson/Aiken SIGMOD'03, with
    an exact cross-engine contract: md5-hex-string gram hashes +
    string window minima, upgrading the winnow family from rows-only;
    exact oracle + Python twin + shared-run-guarantee test in
    tests/test_winnow_words.py; r13 debut via NEXT_ROUND_BACKLOG)
    makes 208. The r12-added D78 surface (events_attribution —
    last-touch conversion attribution, the single-touch baseline of
    Shao & Li KDD'11: D1 as-of credit within a 7-day lookback,
    same-instant touches deduped by max event_id, DECIMAL(18,2)
    revenue; exact ASOF-JOIN oracle + Python twin in
    tests/test_attribution.py; r13 debut via NEXT_ROUND_BACKLOG)
    makes 209. The r12-added D79 surface (text_source_kl — per-source
    lexical KL divergence over add-1-smoothed hashed-unigram
    distributions, the WIMBD-style per-source audit: full fixed-
    bucket-space grid, nano-nat quantized terms, identity ROUND 9;
    exact oracle + Python twin in tests/test_source_kl.py; r13 debut
    via NEXT_ROUND_BACKLOG) makes 210. The r12-added D80 surface
    (embedding_jl_project — JL ±1 sign projection 64→16, Achlioptas
    2003, with content-addressed md5-parity signs embedded as
    identical literals in both engines (the D74b precedent) and
    per-term micro quantization, upgrading the projection family from
    rows-only; exact generated oracle + Python twin +
    controlled-geometry test in tests/test_jl.py; r13 debut via
    NEXT_ROUND_BACKLOG) makes 211. The r12-added D81 surface
    (text_burstiness — per-term dispersion-index report, Church &
    Gale 1995 Poisson mixtures: VMR of per-doc counts over all N
    documents with zeros folded analytically, separating topical
    burst from Poisson boilerplate; exact oracle + Python twin in
    tests/test_burstiness.py; r13 debut via NEXT_ROUND_BACKLOG)
    makes 212. The r12-added D82 surface (text_readability —
    Flesch-Kincaid grade + reading ease, Flesch 1948 / Kincaid et al.
    1975, vowel-group syllable proxy and mirrored double trees with
    identity ROUND 6; exact oracle + Python twin in
    tests/test_readability.py; r13 debut via NEXT_ROUND_BACKLOG)
    makes 213. The r12-added D83 surface (text_vocab_composition —
    per-source lexical-richness report in the LNRE tradition, Baayen
    2001: hapax share, TTR, and exclusive-vocabulary share vs the
    pool; exact oracle + Python twin in
    tests/test_vocab_composition.py; r13 debut via
    NEXT_ROUND_BACKLOG) makes 214. The r12-added D84 surface
    (events_sessions — batch gap-based sessionization, the classic
    gaps-and-islands 30-minute-timeout assignment: per-session
    ordinal index, bounds, depth, complete-interval duration (Spark
    timestampdiff = DuckDB datesub, verified — datediff counts
    boundary crossings and is the wrong mirror), B12-decimal value;
    exact oracle + Python twin in tests/test_sessions.py; r13 debut
    via NEXT_ROUND_BACKLOG) makes 215. The r12-added D85 surface
    (dedup_minhash_planned — the C2/D74b end-to-end: minhash dedup
    whose (b, r) come from choose_lsh_parameters instead of a
    hand-pick, closing VERDICT r11 ask #7 in the registry; rows-only
    by nature like the rest of the minhash family, recall/cost
    frontier pinned in tests/test_soft_lsh_plan.py; r13 debut via
    NEXT_ROUND_BACKLOG) makes 216. The r12-added D86 surface
    (text_classifier_lr — gradient-trained logistic regression, the
    literal fastText/GPT-3-filter form: 2 full-batch epochs with
    integer micro-logit weights and per-doc gradient contributions
    floor-quantized before the bucket sums, so the TRAINING LOOP
    itself hash-adjudicates against an epoch-unrolled exact oracle;
    Python twin + separable-corpus + partitioning-independence tests
    in tests/test_classifier_lr.py; r13 debut via
    NEXT_ROUND_BACKLOG) makes 217. The r12-added D87 surface
    (text_langid_ngram — Cavnar & Trenkle 1994 character-n-gram
    language ID: out-of-place rank distance over self-trained
    trigram profiles, upgrading the C4 stopword heuristic; ranks are
    total-order ROW_NUMBERs and distances integer sums so the
    PREDICTION hash-adjudicates; exact oracle + Python twin +
    planted-multilingual tests in tests/test_langid_ngram.py; r13
    debut via NEXT_ROUND_BACKLOG) makes 218. The r13-added D88
    surface (pipeline_curate_classifier — the GPT-3 Appendix-A
    trained-filter curation end-to-end, VERDICT r12 ask #5: md5
    dedup → NB trained trusted-vs-raw on the deduped corpus → keep
    above-corpus-mean scores, all-integer exact oracle; e2e
    beats-the-heuristic fixture in tests/test_curate_classifier.py;
    r14 debut via NEXT_ROUND_BACKLOG) makes 219. The r13-added D89
    surface (text_classifier_lr_prob — the calibrated-probability
    face of the D86 LR, VERDICT r12 ask #6: floor(σ(z/1e6)·1e6)
    integer micro-probs with operator-mirrored float trees, exact
    oracle wrapping the shared _LR_ORACLE; ranking-preservation +
    score_calibrate composition pins in tests/test_classifier_lr.py;
    r14 debut via NEXT_ROUND_BACKLOG) makes 220. The r13-added D90
    surface (pipeline_curate_langid — curation with the TRAINED
    language gate, VERDICT r12 ask #7: the pipeline_curate capstone
    filtering on D87 n-gram predictions instead of metadata labels,
    exact composed oracle; heuristic-misroutes fixture in
    tests/test_curate_langid.py; r14 debut via NEXT_ROUND_BACKLOG)
    makes 221. The r13-added D91 surface (text_mojibake — the
    CCNet/C4 encoding-noise gate: U+FFFD / C0-control / non-ASCII
    density counts as exact length-diffs, noise PLANTED
    deterministically into the pure-ASCII corpus per the D47/D80
    precedent so the gate is non-vacuous; exact oracle + Python twin
    in tests/test_mojibake.py; r14 debut via NEXT_ROUND_BACKLOG)
    makes 222. The r13-added D92 surface (events_mad_outliers —
    median/MAD modified z-score outlier report, Iglewicz & Hoaglin
    1993: doubled DECIMAL order statistics avoid all division and the
    3.5 cutoff clears fractions exactly (1349·dev2 > 3500·mad4);
    exact oracle + Decimal twin in tests/test_mad_outliers.py; r14
    debut via NEXT_ROUND_BACKLOG) makes 223. The r13-added D93
    surface (text_fertility — per-source tokenizer-fertility report,
    Rust et al. 2021: chars/words/BPE-ish tokens with micro-quantized
    ratios, ONE map-side-combined aggregate; exact oracle + Python
    twin in tests/test_fertility.py; r14 debut via
    NEXT_ROUND_BACKLOG) makes 224. The r13-added D94 surface
    (events_changepoint — Page 1954 CUSUM mean-shift changepoint:
    T_k = n·P_k − k·V keeps the whole argmax in exact DECIMAL with
    no divided mean, (ts, id)-tie-broken series order; exact oracle
    + Decimal twin + planted-shift test in tests/test_changepoint.py;
    r14 debut via NEXT_ROUND_BACKLOG) makes 225. The r13-added D95
    surface (text_classifier_agreement — Cohen's kappa between the
    D75 NB and D86 LR keep/drop decisions, Cohen 1960 + Landis-Koch
    bands: exact int64 confusion/chance arithmetic, one mirrored
    division; exact oracle composing the shared _NB_ORACLE/_LR_ORACLE;
    Python twin + canonical-value tests in tests/test_agreement.py;
    r14 debut via NEXT_ROUND_BACKLOG) makes 226. The r13-added D96
    surface (text_classifier_auc — exact Mann-Whitney ranking AUC of
    the D86 LR score vs the trusted label, Hanley & McNeil 1982:
    distinct-score tie-exact int64 arithmetic on the D45/D61
    range-partition machinery, no single-task sort, one mirrored
    division; exact oracle composing _LR_ORACLE; Python twin +
    perfect/inverted/tied/partitioning tests in tests/test_auc.py;
    r14 debut via NEXT_ROUND_BACKLOG) makes 227. The r13-added D97
    surface (drift_wasserstein — per-source Wasserstein-1 distance
    to the pool, Vallender 1974 closed form: W1·Na·Nb as a fully
    INTEGER sum over the pool support with an integer `div`, the
    transport-cost drift metric bin-wise PSI/JS/TV cannot express;
    exact oracle; Python twin + shift-magnitude tests in
    tests/test_wasserstein.py; r14 debut via NEXT_ROUND_BACKLOG)
    makes 228. The r13-added D98 surface (text_classifier_calibration
    — the reliability / calibration-curve report over the D89
    probabilities vs the trusted label, DeGroot & Fienberg 1983 / Guo
    et al. 2017: equal-width probability buckets, mean prediction vs
    empirical positive rate, EVERYTHING integer (micro sums, counts,
    integer div); exact oracle composing _LR_ORACLE + the D89
    sigmoid; Python twin + calibrated/overconfident canonical cases
    in tests/test_calibration.py; r14 debut via NEXT_ROUND_BACKLOG)
    makes 229. The r13-added D99 surface (text_classifier_pr_curve —
    precision/recall/F1 threshold sweep over the D89 probabilities,
    Davis & Goadrich 2006: nine deci-probability cutoffs, all-integer
    counts + integer div, F1 in the 2tp/(pred+pos) algebraic form,
    NULL on empty denominators; exact oracle composing _LR_ORACLE +
    the D89 sigmoid; Python twin + monotonicity/edge contracts in
    tests/test_pr_curve.py; r14 debut via NEXT_ROUND_BACKLOG)
    makes 230. The r13-added D100 surface
    (text_classifier_lr_persisted — the D86 LR served from a
    PERSISTED model artifact, the ivf/pq_build amortization contract
    applied to the trained filter: lr_model_build writes the
    ≤256-row weights + bias + meta sidecar once, serving broadcasts
    them with ZERO training jobs; scores bit-identical to the inline
    face, so even the persisted face keeps the EXACT epoch-unrolled
    oracle; round-trip parity + zero-training-job + sidecar pins in
    tests/test_lr_persisted.py; r14 debut via NEXT_ROUND_BACKLOG)
    makes 231. The r13-added D101 surface (pipeline_curate_lm — the
    literal CCNet selection, Wenzek et al. 2020: md5 dedup → D76
    trigram stupid-backoff LM trained on the deduped trusted slice →
    keep documents below the corpus-mean cross-entropy (exact integer
    relative gate on the micro-nat grid, the D88 rationale); with D88
    both published trained-filter recipes are end-to-end registry
    surfaces; exact composed oracle; planted fluent-vs-salad fixture
    + degenerate contracts in tests/test_curate_lm.py; r14 debut via
    NEXT_ROUND_BACKLOG) makes 232.
    """
    assert len(REGISTRY) == 232, (
        f"registry count changed ({len(REGISTRY)} != 232); new queries "
        "need a rotation plan before registration"
    )


def test_rotation_ledger_current():
    """ROTATION.md is generated from CORRECTNESS_r*.json + the current
    head; it must match a fresh render (stale ledger = unaudited
    rotation), and every never-driver-checked query must either sit in
    the current head (adjudicated this round) or in the declared
    next-round backlog — so no registered query can silently stay
    outside external adjudication forever (VERDICT r3 ask #3)."""
    import pathlib
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo / "scripts"))
    try:
        import gen_rotation
    finally:
        sys.path.pop(0)

    committed = (repo / "ROTATION.md").read_text()
    # Full-equality freshness applies only while the committed ledger
    # covers the same CORRECTNESS_r* files that exist on disk. The
    # driver drops a NEW round file after the round's last commit, which
    # would otherwise greet the next round with a red gate before the
    # builder can regenerate — in that window only the invariant below
    # is enforced (and regenerating is the next round's first chore).
    import re

    header = next(
        (ln for ln in committed.splitlines() if ln.startswith("| query |")), ""
    )
    committed_rounds = set(re.findall(r"\br(\d+)\b", header))
    rounds = gen_rotation._round_files()
    if committed_rounds == {str(rn) for rn in rounds}:
        assert committed == gen_rotation.render(), (
            "ROTATION.md is stale — run: python scripts/gen_rotation.py"
        )
    checked = {n for recs in rounds.values() for n in recs}
    unscheduled = [
        n
        for n in REGISTRY
        if n not in checked
        and n not in DRIVER_PRIORITY
        and n not in gen_rotation.NEXT_ROUND_BACKLOG
    ]
    assert not unscheduled, (
        f"never-driver-checked queries with no rotation plan: {unscheduled}"
    )


def test_head_queries_output_scalar_columns(spark, sf_dir):
    """Head-shape lint: no driver-window query may output a top-level
    ArrayType/MapType/StructType column — the driver's canonicalizer does
    a pandas sort_values over all columns and dies on unhashable cells
    (``TypeError: unhashable type: 'list'`` — embedding_quantize,
    CORRECTNESS_r03) — nor a top-level DecimalType: the canonicalizer
    normalizes decimals asymmetrically between the Spark and DuckDB
    result paths (``agg_salted`` hash-FAILed in CORRECTNESS_r04 with
    bit-identical values). Declare money aggregates as
    ROUND(CAST(x AS DOUBLE), 2) per SURVEY §2.2; keep decimal math
    internal. Only schema is inspected here (no job runs).
    """
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad: dict[str, list[str]] = {}
    for name in DRIVER_PRIORITY:
        df = REGISTRY[name].fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType, (ArrayType, MapType, StructType, DecimalType)
            )
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        f"head queries with unhashable/shape-unsafe top-level columns: {bad}"
    )
