"""Generate ROTATION.md — the driver-head rotation ledger.

The external driver hash-checks only the first 50 registered queries per
round; with ~100 registered, head slots rotate so every oracled query
gets external adjudication within a few rounds (VERDICT r3 ask #3). This
ledger is GENERATED from the per-round CORRECTNESS_r*.json files plus
the current DRIVER_PRIORITY, so the rotation history is auditable at a
glance instead of living in comment blocks. Regenerate after each
round's CORRECTNESS file lands:

    python scripts/gen_rotation.py        # rewrites ROTATION.md

tests/test_registry.py::test_rotation_ledger_current asserts the
committed file matches a fresh render, and that every query not yet
driver-checked either sits in the current head (checked this round) or
in the declared next-round backlog.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that have never held a head slot and are deliberately deferred
# to the NEXT round's rotation (head capacity is 50). The four r8-added
# D33/D34/D35/D37 surfaces hold r9 head slots per the r9 plan below;
# the six entries here are the r9-ADDED surfaces — the r9 head was
# already full, so they debut in r10. The first two are the VERDICT r8
# ask #4/#5 scale-path variants, rows-only by nature (approximate ANN /
# float-argmax assignment) and locally gated (tests/test_pq.py
# round-trip + zero-training-job pin; tests/test_semantic_ivf.py
# survivor invariant + plan pins); the other four carry exact DuckDB
# oracles. The ledger test fails if a query is neither checked, in the
# head, nor here.
NEXT_ROUND_BACKLOG: tuple[str, ...] = (
    # r15: EMPTY — the full D88-D101 cohort below moved into
    # DRIVER_PRIORITY (r15 head debut slots; r14 was an optimization
    # round that reused the r13 head verbatim, so the debut deferred
    # one extra round). No new queries were registered in r14/r15
    # (optimization rounds, no-new-features rule), so nothing remains
    # unscheduled. The r13 entries are kept below, commented, for the
    # audit trail.
)

_R13_BACKLOG_NOW_IN_HEAD: tuple[str, ...] = (
    # r13: the thirteen r12-added queries (D75-D87) all hold r13 head
    # slots (debut round — the backlog emptied into DRIVER_PRIORITY
    # per the r13 plan below); entries added here are r13-ADDED
    # queries that debut in r14.
    # D88 trained-filter curation — the GPT-3 Appendix-A pipeline
    # end-to-end (Brown et al. 2020): md5 dedup → NB trained
    # trusted-vs-raw ON the deduped corpus → keep above-corpus-mean
    # scores (relative gate, exact integer compare; VERDICT r12 ask
    # #5). Exact oracle; e2e beats-the-heuristic fixture in
    # tests/test_curate_classifier.py.
    "pipeline_curate_classifier",
    # D89 calibrated-probability face of the D86 LR (VERDICT r12 ask
    # #6): floor(σ(score/1e6)·1e6) integer micro-probs, mirrored
    # float trees; ranking-preservation + score_calibrate
    # composition pins in tests/test_classifier_lr.py.
    "text_classifier_lr_prob",
    # D90 curation with the TRAINED language gate (VERDICT r12 ask
    # #7): pipeline_curate filtering on D87 n-gram predictions
    # instead of metadata labels; exact composed oracle;
    # heuristic-misroutes fixture in tests/test_curate_langid.py.
    "pipeline_curate_langid",
    # D91 encoding-noise / mojibake gate (CCNet/C4 cleaning step,
    # Wenzek et al. 2020): U+FFFD / control / non-ASCII counts as
    # exact length-diffs; noise planted deterministically (D47/D80
    # precedent) so the gate is non-vacuous; Python twin in
    # tests/test_mojibake.py.
    "text_mojibake",
    # D92 median/MAD robust outlier report (Iglewicz & Hoaglin 1993
    # modified z-score): doubled DECIMAL order statistics, fraction-
    # free cutoff; Decimal twin in tests/test_mad_outliers.py.
    "events_mad_outliers",
    # D93 per-source tokenizer-fertility report (Rust et al. 2021):
    # chars/words/BPE-ish tokens + micro ratios, one aggregate;
    # Python twin in tests/test_fertility.py.
    "text_fertility",
    # D94 CUSUM mean-shift changepoint (Page 1954): T_k = n·P_k − k·V
    # exact-DECIMAL argmax, no divided mean; Decimal twin +
    # planted-shift test in tests/test_changepoint.py.
    "events_changepoint",
    # D95 Cohen's-kappa agreement between the D75/D86 classifiers
    # (Cohen 1960; Landis & Koch 1977 bands): exact int64 confusion
    # + chance arithmetic; Python twin in tests/test_agreement.py.
    "text_classifier_agreement",
    # D96 exact Mann-Whitney ranking AUC of the D86 score vs the
    # trusted label (Hanley & McNeil 1982): tie-exact distinct-score
    # arithmetic on the D45/D61 range-partition machinery; Python
    # twin in tests/test_auc.py.
    "text_classifier_auc",
    # D97 per-source Wasserstein-1 drift vs the pool (Vallender 1974
    # closed form): fully integer transport cost on the pool support;
    # Python twin + shift-magnitude tests in tests/test_wasserstein.py.
    "drift_wasserstein",
    # D98 classifier reliability / calibration-curve report (DeGroot
    # & Fienberg 1983; Guo et al. 2017): all-integer bucket means vs
    # empirical rates; twin in tests/test_calibration.py.
    "text_classifier_calibration",
    # D99 precision/recall/F1 threshold sweep (Davis & Goadrich
    # 2006): all-integer operating-curve table at nine cutoffs;
    # twin in tests/test_pr_curve.py.
    "text_classifier_pr_curve",
    # D100 persisted-model LR serving (the ivf/pq amortization
    # contract on the trained filter): exact oracle (bit-identical to
    # the inline face); round-trip + zero-training-job pins in
    # tests/test_lr_persisted.py.
    "text_classifier_lr_persisted",
    # D101 perplexity-gated curation — the CCNet selection (Wenzek et
    # al. 2020): LM trained on the deduped trusted slice, keep
    # below-mean cross-entropy (exact integer gate); fluent-vs-salad
    # fixture in tests/test_curate_lm.py.
    "pipeline_curate_lm",
)

# Emitted verbatim at the end of ROTATION.md.
R7_PLAN = """\
## r7 rotation (executed)

The r6 freeze drained the adjudication backlog (every one of the 119
r6-registered queries has >=1 driver row across r1-r6), so r7 THAWED
registration: the 30 staged (query, oracle) pairs moved verbatim into
the registry (149 total) and every debut holds a head slot. Also in
the 50-slot head: `quality_report` (re-land after the oracle-side
HUGEINT->BIGINT cast — the one red r6 row), second-green slots for the
13 r6 first-timers, a third green for the once-FAILed `agg_salted`,
and second greens for five r5 first-greens (`dedup_embedding`,
`similarity_pairs`, `similarity_pairs_blocked`, `stream_rollup_batch`,
`text_stats`).

Head arithmetic: 1 re-land + 30 debuts + 13 second-greens + 1
`agg_salted` + 5 r5 second-greens = 50. Displaced: 24 thrice-proven
hash rows plus the six rows-only re-adjudications (each already
carries 1-2 driver rows-only rows and has no oracle to upgrade them) —
every displaced component stays guarded by the proven-component rule
in tests/test_registry.py.

Shape change at registration (VERDICT r6 ask #4): `events_anomaly`
registered as the REDUCE-FIRST volume variant
(operators/anomaly.window_count_anomaly — 6-hour tumbling counts per
event type, z-scored against the trailing 24 windows) instead of the
raw per-row z-score whose 5-value key made the whole event table sort
in 5 tasks. The raw `rolling_zscore` remains the operator for
high-cardinality keys, scale note in its docstring.

## r8 plan

All 155 registered queries except the six r8 debuts will have >=1
driver row once CORRECTNESS_r07 lands green. r8 head priorities, in
order:
1. Any r7 red rows (fix + re-land).
2. First re-greens for r7 debuts that landed rows-only or shaky.
3. Second green rows for the r7 debuts (the 30 never-checked-before
   queries should not rest on a single adjudication), rotating ~20 per
   round so every debut reaches 2 rows by r9.
4. Debut head slots for the r7-added incremental near-dup pair —
   `dedup_jaccard_incremental` (exact gram-index oracle) and
   `dedup_minhash_incremental` (band-store probe, rows-only) — and the
   r7-added D26 advisor/prune pair: `join_strategy` (exact decision
   oracle) and `join_bloom_prune` (exact: output is bit-identical to
   the plain join the oracle runs); plus the D27 `join_interval`
   debut (bucketized interval-overlap join, exact non-equi oracle)
   and the D28 `privacy_kanon` debut (k-anonymity suppression gate,
   exact window-count oracle).
5. Backfill third greens for r5/r6 first-timers as slots allow.

## r8 rotation (executed)

CORRECTNESS_r07 landed the project's first perfect window (50/50 hash,
0 rows-only, 0 FAIL), so r8's head clears the two remaining debts at
once:

1. **10 debut slots** — every never-driver-checked query: the six
   D25-D28 r8 debuts declared in r7's NEXT_ROUND_BACKLOG
   (`dedup_jaccard_incremental`, `dedup_minhash_incremental`,
   `join_strategy`, `join_bloom_prune`, `join_interval`,
   `privacy_kanon`) plus the four D29-D32 surfaces from the r7
   snapshot commit (`events_winsorize`, `events_paths`,
   `dedup_semantic`, `pipeline_curriculum`), now first-class (unit
   tests, plan pins, SURVEY rows, reviewed broadcast) per VERDICT r7
   asks #1/#2.
2. **30 second-green slots** — ALL r7 debuts at once (the whole cohort
   reaches 2 driver rows this round instead of splitting 20/10 across
   r8/r9): drift_psi, skew_profile, join_explosion,
   sketch_kmv_overlap, sketch_bloom_probe, sample_split_group,
   events_anomaly, events_resample, events_ohlc, events_transitions,
   text_pmi, knn_classify, dedup_substring, dedup_cluster_cc, and the
   16 TPC-H shapes (q2/q4/q7/q8/q9/q11-q17/q19-q22).
3. **9 third-green slots** — the r5/r6-added components still short of
   thrice-proven keep one evidence query each in the head per the
   proven-component rule; this round graduates all nine (`cdc_scd2`,
   `dedup_incremental`, `events_funnel`, `fuzzy_name_pairs`,
   `pipeline_mix`, `quality_report`, `rollup_incremental`,
   `sample_topn_group`, `sketch_histogram_q`).
4. **1 r1-singleton slot** — `agg_stats` (single driver row, from r1).

Head arithmetic: 10 + 30 + 9 + 1 = 50. Displaced: the re-proven r5
first-greens (agg_salted, dedup_embedding, similarity_pairs,
similarity_pairs_blocked, stream_rollup_batch, text_stats — 3+ rows
each after r7) and the two-row r6 first-timers whose components the
nine third-green slots cover (cdc_scd2_asof, events_retention,
sample_weighted_rows, tpch_q1, tpch_q18) — every displaced component
stays guarded by the proven-component rule in tests/test_registry.py.

## r9 plan

After CORRECTNESS_r08 lands green, every registered query has >=1
driver row, every r7 debut has 2, and all nine r5/r6 components are
thrice-proven (freeing their standing slots). r9 priorities, in order:

1. Any r8 red rows (fix + re-land).
2. Debut head slots for the r8-added D33/D34 pair —
   `events_estimate` (exact oracle: the deterministic md5 sample plus
   closed-form CI arithmetic is engine-reproducible) and
   `events_heavy_hitters` (exact oracle: the certified two-pass
   answer IS the plain GROUP BY top-k), plus `text_bpe_tokens`
   (D35 BPE tokenizer — rows-only by nature; trainer proven bit-equal
   to a pure-Python reference in tests/test_bpe.py) and `ann_pq_topk`
   (D37 product-quantized ANN — rows-only; recall gated in
   tests/test_pq.py).
3. Second greens for the 10 r8 debuts.
4. Second rows for the remaining r1-singletons (`agg_approx_distinct`,
   `agg_approx_percentile`, `agg_corr`, `agg_groupconcat`,
   `set_except`, `set_intersect`, `set_union`) and the thinnest
   two-row queries (`dedup_fingerprint`, `text_langid`, r2 rows).
5. Third greens for r6/r7 first-timers as slots allow.

## r9 rotation (executed)

CORRECTNESS_r08 landed 49 hash + 1 rows-only-by-design, 0 FAIL, so the
r9 head executes the plan above:

1. **4 debut slots** — the r8-built D33/D34/D35/D37 surfaces:
   `events_estimate`, `events_heavy_hitters` (exact oracles),
   `text_bpe_tokens`, `ann_pq_topk` (rows-only by nature; locally
   gated — and `ann_pq_topk` now trains via the FUSED Lloyd's loop,
   19.1 s → ~2.9 s at sf0.1, VERDICT r8 ask #2).
2. **10 second-green slots** — every r8 debut
   (`dedup_jaccard_incremental`, `dedup_minhash_incremental`,
   `join_strategy`, `join_bloom_prune`, `join_interval`,
   `privacy_kanon`, `events_winsorize`, `events_paths`,
   `dedup_semantic`, `pipeline_curriculum`).
3. **9 singleton-backfill slots** — `agg_approx_distinct`,
   `agg_approx_percentile`, `agg_corr`, `agg_groupconcat`,
   `set_except`, `set_intersect`, `set_union` (r1 rows only) plus
   `dedup_fingerprint`, `text_langid` (r2 rows only). After r9 no
   registered query's newest driver row predates r6.
4. **27 third-green slots** — the five r6 two-row first-timers
   (`cdc_scd2_asof`, `events_retention`, `sample_weighted_rows`,
   `tpch_q1`, `tpch_q18`), the 14 non-TPCH r7 debuts, a third green
   for `quality_report` (its r6 row was the HUGEINT red, so the D15
   component is not yet thrice-proven), and 7 TPCH shapes including
   the q9/q21 bench-retime targets.

Head arithmetic: 4 + 10 + 9 + 27 = 50. Displaced: the r8
thrice-proven graduates (cdc_scd2, dedup_incremental, events_funnel,
fuzzy_name_pairs, pipeline_mix, rollup_incremental, sample_topn_group,
sketch_histogram_q) and the 8 TPCH shapes already at 2 rows that
didn't fit — all component-guarded.

## r10 plan

After CORRECTNESS_r09 lands green, every registered query except the
two r9-added scale variants has >=1 driver row. r10 priorities:

1. Any r9 red rows (fix + re-land).
2. Debut head slots for the five r9-added queries —
   `ann_pq_persisted` (D37 persisted codes+codebook probe; rows-only,
   round-trip parity and the zero-training-job pin in
   tests/test_pq.py), `dedup_semantic_ivf` (D31 learned-codebook
   SemDeDup; rows-only, survivor invariant in
   tests/test_semantic_ivf.py), and the D38/D39/D40 trio with exact
   oracles (`dedup_keep_best` quality-aware cluster resolution,
   `table_profile` one-pass column profiler, `privacy_dp_counts`
   discrete-Laplace DP release — parity-proven locally) and the D41
   `dedup_cluster_incremental` (incremental CC vs the full-recompute
   closure oracle), the D42 `score_calibrate` (cross-source quantile
   calibration) and the D43 `similarity_tfidf` (sparse TF-IDF top-k,
   integer-quantized weights for engine-exact ranking), and the D44
   `pipeline_temperature` (temperature-based domain mixing,
   integer-grid keep probabilities).
3. Second greens for the four r9 debuts.
4. Third greens for the r8-debut cohort so no D25-D32 surface rests
   on two adjudications by r11; backfill the remaining two-row TPCH
   shapes as slots allow.

## r10 rotation (executed)

CORRECTNESS_r09 landed 45 hash + 5 rows-only-by-design, 0 FAIL, so the
r10 head executes the plan above:

1. **9 debut slots** — every r9-built surface: the D38/D39/D40 trio
   (`dedup_keep_best`, `table_profile`, `privacy_dp_counts`), the D41
   `dedup_cluster_incremental`, the D42/D43/D44 trio
   (`score_calibrate`, `similarity_tfidf`, `pipeline_temperature`) —
   all with exact oracles — plus the two rows-only scale variants
   (`ann_pq_persisted`, `dedup_semantic_ivf`).
2. **4 second-green slots** — the r9 debuts (`events_estimate`,
   `events_heavy_hitters`, `text_bpe_tokens`, `ann_pq_topk`).
3. **13 second-green slots** — every remaining one-row query:
   `ann_ivf_persisted`, `ann_ivf_topk`, `ann_lsh_topk`,
   `dedup_minhash_verified`, `embedding_centroids`,
   `embedding_project`, `sample_stratified`, `sketch_cms_freq`,
   `sketch_hll_rollup`, `text_bm25`, `text_repetition`,
   `text_top_terms`, `tpch_q10_shape`. After r10 every registered
   query has >=2 driver rows.
4. **10 third-green slots** — the full r8-debut cohort (VERDICT r9
   ask #4): `dedup_jaccard_incremental`, `dedup_minhash_incremental`,
   `join_strategy`, `join_bloom_prune`, `join_interval`,
   `privacy_kanon`, `events_winsorize`, `events_paths`,
   `dedup_semantic`, `pipeline_curriculum`.
5. **11 third-green slots** — every remaining two-row TPC-H shape
   (ask #8): `tpch_q3_shape`, `tpch_q6` (newest rows r3) and
   `tpch_q11/q12/q13/q14/q15/q16/q19/q20/q22_shape`.
6. **3 slots** — the stalest r2 two-row queries (`filter_pred`,
   `join_anti`, `window_rank`).

Head arithmetic: 9 + 4 + 13 + 10 + 11 + 3 = 50. Displaced: the r9
thrice-proven graduates (cdc_scd2_asof, events_retention,
sample_weighted_rows, tpch_q1, tpch_q18, quality_report, the 14
non-TPCH r7 debuts, the 7 r9 TPCH third-greens, and the r1/r2
singleton backfills now at 2-6 rows) — all component-guarded via the
proven-component rule in tests/test_registry.py.

## r11 plan

After CORRECTNESS_r10 lands green, every registered query has >=2
driver rows and the r8 cohort is thrice-proven. r11 priorities:

1. Any r10 red rows (fix + re-land).
2. **18 debut head slots** — every query registered during r10, all
   declared in NEXT_ROUND_BACKLOG as they landed: the six from the
   round's first half (`score_calibrate_global`,
   `table_profile_approx`, `sample_quota`, `multimodal_phash_dedup`,
   `text_lm_score`, `dedup_containment` — D45-D49 + the approx
   profiler face) and the twelve from the second half
   (`dedup_segments`, `pipeline_dsir`, `text_gopher_rules`,
   `dedup_cdc_chunks`, `pipeline_length_buckets`,
   `multimodal_audio_trim`, `events_bootstrap`, `sample_weighted_k`,
   `dedup_cluster_density`, `search_rrf_fusion`,
   `dedup_segments_within`, `agg_quantiles_global` — D50-D61). All
   carry exact oracles except `table_profile_approx` (rows-only by
   construction).
3. **9 second-green slots** — the r10 debuts (`dedup_keep_best`,
   `table_profile`, `privacy_dp_counts`, `dedup_cluster_incremental`,
   `score_calibrate`, `similarity_tfidf`, `pipeline_temperature`,
   `ann_pq_persisted`, `dedup_semantic_ivf`).
4. **4 third-green slots** — the r9-debut cohort (`events_estimate`,
   `events_heavy_hitters`, `text_bpe_tokens`, `ann_pq_topk`).
5. Remaining ~20 slots: third greens for the 13 r10 second-green
   singles plus the stalest two-row queries, so no surface rests on
   two adjudications by r12.

Head arithmetic: 18 + 9 + 4 = 31 pinned, ~19 rotation slots. The
NEXT_ROUND_BACKLOG tuple empties into the r11 head at the next
DRIVER_PRIORITY rotation; the ledger test keeps the accounting
honest until then.

## r11 rotation (executed)

CORRECTNESS_r10 landed 38 hash + 12 rows-only-by-design, 0 FAIL (the
fourth consecutive clean window), so the r11 head executes the plan
above:

1. **18 debut slots** — every query registered during r10, i.e. the
   full r10 NEXT_ROUND_BACKLOG: `score_calibrate_global`,
   `table_profile_approx`, `sample_quota`, `multimodal_phash_dedup`,
   `text_lm_score`, `dedup_containment`, `dedup_segments`,
   `pipeline_dsir`, `text_gopher_rules`, `dedup_cdc_chunks`,
   `pipeline_length_buckets`, `multimodal_audio_trim`,
   `events_bootstrap`, `sample_weighted_k`, `dedup_cluster_density`,
   `search_rrf_fusion`, `dedup_segments_within`,
   `agg_quantiles_global`. All carry exact oracles except
   `table_profile_approx` (rows-only by construction).
2. **9 second-green slots** — the r10 debuts (`dedup_keep_best`,
   `table_profile`, `privacy_dp_counts`, `dedup_cluster_incremental`,
   `score_calibrate`, `similarity_tfidf`, `pipeline_temperature`,
   `ann_pq_persisted`, `dedup_semantic_ivf`).
3. **4 third-green slots** — the r9-debut cohort (`events_estimate`,
   `events_heavy_hitters`, `text_bpe_tokens`, `ann_pq_topk`).
4. **19 staleness slots** — the standing rule (oldest newest-row
   first): the nine r2-newest two-row queries (`agg_rollup`,
   `join_full`, `sort_limit_topk`, `stream_tumbling_batch`,
   `subquery_recursive`, `subquery_scalar`, `udf_pandas`,
   `window_lag`, `window_running`), the eight r3-newest two-row
   queries (`agg_grouping_sets`, `agg_pivot`, `dedup_minhash`,
   `dedup_simhash`, `json_funcs`, `pipeline_curate`, `sample_split`,
   `text_quality`), plus `topk_similarity` (r3) and `agg_group` (the
   flagship entry query, newest row r3).

Head arithmetic: 18 + 9 + 4 + 19 = 50. Displaced: the r10
thrice-proven graduates (the D25-D32 cohort, the 11 TPC-H backfills,
filter_pred/join_anti/window_rank) and the 13 r10 second-green
singles (each now at 2-3 rows) — all component-guarded via the
proven-component rule in tests/test_registry.py.

## r12 plan

After CORRECTNESS_r11 lands green, every registered query except the
fifteen r11-added surfaces has >=2 driver rows and no query's newest
row predates r4. r12 priorities, in order:

1. Any r11 red rows (fix + re-land).
2. **15 debut head slots** — every query registered during r11 (the
   NEXT_ROUND_BACKLOG above, in order): `dedup_spans`,
   `dedup_spans_trim` (D62 maximal duplicated spans + trim),
   `text_novelty` (D63), `text_entropy` (D64), `text_zipf` (D65),
   `dedup_source_overlap` (D66), `embedding_health` (D67),
   `sample_kcenter` (D68 — rows-only by nature),
   `text_hashed_features` (D69), `events_trimmed_mean` (D70),
   `pipeline_decontaminate_spans` (D71), `text_heaps` (D72),
   `pipeline_token_budget` (D73), `dedup_soft_weights` (D74),
   `dedup_lsh_plan` (D74b). All carry exact oracles except
   `sample_kcenter`.
3. Second greens for the 18 r11 debuts (the r10-built D45-D61
   cohort) as slots allow — none should rest on one adjudication.
4. Third greens for the 9 r10 debuts; staleness backfill per the
   standing rule (oldest newest-row first) with the remainder.

## r12 rotation (executed)

CORRECTNESS_r11 landed 43 hash + 7 rows-only-by-design, 0 FAIL (the
fifth consecutive clean window), so the r12 head executes the plan
above:

1. **15 debut slots** — every query registered during r11, i.e. the
   full r11 NEXT_ROUND_BACKLOG in order: `dedup_spans`,
   `dedup_spans_trim`, `text_novelty`, `text_entropy`, `text_zipf`,
   `dedup_source_overlap`, `embedding_health`, `sample_kcenter`,
   `text_hashed_features`, `events_trimmed_mean`,
   `pipeline_decontaminate_spans`, `text_heaps`,
   `pipeline_token_budget`, `dedup_soft_weights`, `dedup_lsh_plan`.
   All carry exact oracles except `sample_kcenter` (rows-only by
   nature). `text_heaps` debuts only after the D72 degenerate-fit
   DIVIDE_BY_ZERO fix (try_divide → NULL beta + min-id-normalized
   buckets, VERDICT r11 weak/ask #2 + ADVICE — pinned by the
   degenerate/offset tests in tests/test_heaps.py).
2. **18 second-green slots** — the r11 debuts (the D45-D61 cohort):
   `score_calibrate_global`, `table_profile_approx`, `sample_quota`,
   `multimodal_phash_dedup`, `text_lm_score`, `dedup_containment`,
   `dedup_segments`, `pipeline_dsir`, `text_gopher_rules`,
   `dedup_cdc_chunks`, `pipeline_length_buckets`,
   `multimodal_audio_trim`, `events_bootstrap`, `sample_weighted_k`,
   `dedup_cluster_density`, `search_rrf_fusion`,
   `dedup_segments_within`, `agg_quantiles_global`.
3. **9 third-green slots** — the r10 debuts (`dedup_keep_best`,
   `table_profile`, `privacy_dp_counts`, `dedup_cluster_incremental`,
   `score_calibrate`, `similarity_tfidf`, `pipeline_temperature`,
   `ann_pq_persisted`, `dedup_semantic_ivf`).
4. **8 staleness slots** — the standing rule (oldest newest-row
   first): the four r3-newest queries (`date_funcs`,
   `join_broadcast`, `join_inner`, `str_funcs`) and the four
   r4-newest (`agg_distinct`, `agg_percentile`, `multimodal_binary`,
   `stream_sliding_batch`).

Head arithmetic: 15 + 18 + 9 + 8 = 50. Displaced: the r11
thrice-proven graduates (the r9-debut cohort — `events_estimate`,
`events_heavy_hitters`, `text_bpe_tokens`, `ann_pq_topk` — and the 19
r11 staleness refreshes, each now at 3-6 rows) — all
component-guarded via the proven-component rule in
tests/test_registry.py.

## r13 plan

After CORRECTNESS_r12 lands green, every registered query has >=1
driver row, the D62-D74b cohort has its debut green, and no query's
newest row predates r5. r13 priorities, in order:

1. Any r12 red rows (fix + re-land).
2. Debut head slots for every query registered during r12 (the
   NEXT_ROUND_BACKLOG above, declared as they land).
3. Second greens for the 15 r12 debuts — none should rest on one
   adjudication.
4. Third greens for the 18 r11 debuts (D45-D61); staleness backfill
   per the standing rule (oldest newest-row first) with the
   remainder.

## r13 rotation (executed)

CORRECTNESS_r12 landed 46 hash + 4 rows-only-by-design, 0 FAIL (the
sixth consecutive clean window), so the r13 head executes the plan
above:

1. **13 debut slots** — every query registered during r12, i.e. the
   full r12 NEXT_ROUND_BACKLOG in order: `text_classifier_nb`,
   `text_lm3_score`, `text_winnow_words`, `events_attribution`,
   `text_source_kl`, `embedding_jl_project`, `text_burstiness`,
   `text_readability`, `text_vocab_composition`, `events_sessions`,
   `dedup_minhash_planned`, `text_classifier_lr`,
   `text_langid_ngram`. All carry exact oracles except
   `dedup_minhash_planned` (rows-only by nature, like the rest of
   the minhash family). All 13 passed the r12 judge's
   driver-equivalent sim (VERDICT r12).
2. **15 second-green slots** — the r12 debuts (the D62-D74b cohort):
   `dedup_spans`, `dedup_spans_trim`, `text_novelty`,
   `text_entropy`, `text_zipf`, `dedup_source_overlap`,
   `embedding_health`, `sample_kcenter`, `text_hashed_features`,
   `events_trimmed_mean`, `pipeline_decontaminate_spans`,
   `text_heaps`, `pipeline_token_budget`, `dedup_soft_weights`,
   `dedup_lsh_plan`.
3. **18 third-green slots** — the r11 debuts (the D45-D61 cohort):
   `score_calibrate_global`, `table_profile_approx`, `sample_quota`,
   `multimodal_phash_dedup`, `text_lm_score`, `dedup_containment`,
   `dedup_segments`, `pipeline_dsir`, `text_gopher_rules`,
   `dedup_cdc_chunks`, `pipeline_length_buckets`,
   `multimodal_audio_trim`, `events_bootstrap`, `sample_weighted_k`,
   `dedup_cluster_density`, `search_rrf_fusion`,
   `dedup_segments_within`, `agg_quantiles_global`.
4. **4 staleness slots** — the standing rule (oldest newest-row
   first, then fewest hash greens, then alphabetical): `agg_cube`,
   `set_ops`, `sort_limit_offset`, `window_analytic` (all newest
   r5 with 4 greens; the other r5-newest queries hold 5 greens and
   wait their turn).

Head arithmetic: 13 + 15 + 18 + 4 = 50. Displaced: the r12
thrice-proven graduates (the r10-debut cohort — `dedup_keep_best`,
`table_profile`, `privacy_dp_counts`, `dedup_cluster_incremental`,
`score_calibrate`, `similarity_tfidf`, `pipeline_temperature`,
`ann_pq_persisted`, `dedup_semantic_ivf` — and the 8 r12 staleness
refreshes, each now at 4-6 rows) — all component-guarded via the
proven-component rule in tests/test_registry.py.

## r14 plan

After CORRECTNESS_r13 lands green, every registered query has >=1
driver row (the 125-vs-138 gap closes), the D62-D74b cohort has two
rows, and no query's newest row predates r5. r14 priorities, in
order:

1. Any r13 red rows (fix + re-land).
2. Debut head slots for every query registered during r13 (the
   NEXT_ROUND_BACKLOG above, declared as they land).
3. Second greens for the 13 r13 debuts (D75-D87) — none should rest
   on one adjudication.
4. Third greens for the 15 r12 debuts (D62-D74b); staleness backfill
   per the standing rule (oldest newest-row first, then fewest hash
   greens) with the remainder — the twelve remaining r5-newest
   queries lead the queue.
"""

def _round_files() -> dict[int, dict]:
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rn = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f) as fh:
            out[rn] = json.load(fh)
    return out


def _cell(rec: dict) -> str:
    if rec.get("hash_match"):
        return "hash"
    if rec.get("err") == "no_oracle":
        return "rows"
    if rec.get("err"):
        return "ERROR"
    return "FAIL"


def render() -> str:
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from mysql2parquet_spark.queries import DRIVER_PRIORITY, REGISTRY, _load

    _load()
    rounds = _round_files()
    rns = sorted(rounds)
    head = set(DRIVER_PRIORITY)

    lines = [
        "# ROTATION — driver-head adjudication ledger",
        "",
        "Generated by `python scripts/gen_rotation.py` from "
        "`CORRECTNESS_r*.json` + the current `DRIVER_PRIORITY`. "
        "Cells: `hash` = full value-hash match, `rows` = rows-only by "
        "design (no oracle), `ERROR`/`FAIL` = red driver row, blank = "
        "not in that round's 50-slot window.",
        "",
        "| query | " + " | ".join(f"r{rn}" for rn in rns) + " | in current head |",
        "| --- | " + " | ".join("---" for _ in rns) + " | --- |",
    ]
    never_checked = []
    for name in sorted(REGISTRY):
        cells = [
            _cell(rounds[rn][name]) if name in rounds[rn] else ""
            for rn in rns
        ]
        if not any(cells):
            never_checked.append(name)
        lines.append(
            f"| {name} | " + " | ".join(cells) + " | "
            + ("yes" if name in head else "") + " |"
        )
    lines += [
        "",
        f"**Never driver-checked ({len(never_checked)}):** "
        + (", ".join(never_checked) if never_checked else "none")
        + ".",
        "",
        "Of these, scheduled in the CURRENT head (adjudicated this round): "
        + (", ".join(sorted(n for n in never_checked if n in head)) or "none")
        + ". Deferred to next round's rotation: "
        + (", ".join(sorted(n for n in never_checked if n not in head)) or "none")
        + ".",
        "",
        R7_PLAN,
    ]
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(REPO, "ROTATION.md")
    with open(out, "w") as fh:
        fh.write(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
