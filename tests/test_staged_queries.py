"""Plan pins for the r7-registered cohort (queries/staged.py).

During the r6 registry freeze these 30 (query, oracle) pairs lived in
``STAGED`` with their own duplicate parity runner; the r7 thaw merged
them into ``REGISTRY`` (VERDICT r6 ask #3), so value parity is now
covered by tests/test_oracle_parity.py like every other registered
query. What stays here are the cohort's PLAN pins — the scale
assertions (semi/anti join shapes, equi-key extraction under
disjunctions, bounded exchange counts, no forced broadcasts) that the
value gate cannot see."""

from __future__ import annotations

from mysql2parquet_spark.queries import REGISTRY, _load
from mysql2parquet_spark.queries.staged import STAGED

_load()


def test_staged_cohort_is_registered():
    # The thaw is total: every staged entry is the SAME Query object in
    # the registry (no divergent copies), and each is either holding a
    # head slot or already driver-adjudicated (the r7/r8 windows gave
    # every cohort member 2 hash rows; after that the head legitimately
    # rotates — the ledger test guards the never-checked case globally).
    import glob
    import json
    import pathlib

    from mysql2parquet_spark.queries import DRIVER_PRIORITY

    repo = pathlib.Path(__file__).resolve().parents[1]
    checked: set[str] = set()
    for f in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        with open(f) as fh:
            checked |= set(json.load(fh))
    for name, q in STAGED.items():
        assert REGISTRY.get(name) is q, f"{name} not registered verbatim"
        assert name in DRIVER_PRIORITY or name in checked, (
            f"{name} neither driver-checked nor holding a head slot"
        )


def test_all_staged_queries_have_oracles():
    # Staging existed to PROVE the oracle before registration; the
    # cohort registers fully-oracled (no rows-only debuts).
    missing = [n for n, q in STAGED.items() if q.oracle is None]
    assert not missing, f"staged queries without oracles: {missing}"


# --- plan pins for the cohort (same bar as the registered head) -----------


def _splan(spark, sf_dir, name, mode="simple"):
    df = STAGED[name].fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_tpch_q4_is_semi_join_not_materialized_exists(spark, sf_dir):
    p = _splan(spark, sf_dir, "tpch_q4_shape")
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p


def test_tpch_q19_extracts_equi_key_from_disjunction(spark, sf_dir):
    # the OR-of-ANDs must not defeat the equi-join extraction: the plan
    # is a hash/sort-merge join on p_partkey = l_partkey with the
    # disjunction as a residual condition, never a nested loop over
    # lineitem x part
    p = _splan(spark, sf_dir, "tpch_q19_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) or (
        "ShuffledHashJoin" in p
    ), p


def test_events_anomaly_bounded_exchanges(spark, sf_dir):
    # reduce-first shape (VERDICT r6 ask #4): the firehose collapses in
    # the count aggregate (partial agg map-side), and only the bounded
    # |keys| x |windows| series enters the sorted z-score frame — one
    # exchange for the count groupBy, one for the window partitioning.
    p = _splan(spark, sf_dir, "events_anomaly")
    assert p.count("Exchange hashpartitioning") <= 2, p
    # map-side partial aggregation must survive in the count stage
    assert "partial_count" in p or "HashAggregate" in p, p


def test_no_forced_broadcast_of_linear_sides_in_staged(spark, sf_dir):
    # VERDICT r5 'What's wrong' #1: part/lineitem-sized sides must not
    # carry a broadcast HINT (AQE may still choose one at runtime from
    # real sizes — that's the point)
    import inspect

    import mysql2parquet_spark.queries.staged as staged_mod

    src = inspect.getsource(staged_mod)
    assert "F.broadcast" not in src, (
        "staged queries must leave join strategies to AQE unless the "
        "side is provably bounded"
    )


def test_tpch_q21_correlated_exists_as_semi_and_anti(spark, sf_dir):
    # both correlated subqueries must land as equi-keyed semi/anti joins
    # on l_orderkey with the supplier inequality as residual — never a
    # nested loop over lineitem x lineitem
    p = _splan(spark, sf_dir, "tpch_q21_shape")
    assert "LeftSemi" in p, p
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q13_left_join_survives(spark, sf_dir):
    # zero-order customers must reach the c_count=0 bucket: the LEFT
    # join must not be rewritten to inner by the count aggregate
    p = _splan(spark, sf_dir, "tpch_q13_shape")
    assert "LeftOuter" in p, p


def test_dedup_substring_never_pairs_documents(spark, sf_dir):
    # the candidate marker is a groupBy on the gram key plus a semi
    # join — documents never meet pairwise, no join over text columns
    p = _splan(spark, sf_dir, "dedup_substring")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftSemi" in p, p


def test_text_pmi_pair_join_is_doc_keyed(spark, sf_dir):
    # the pair generator joins on the doc key (bounded per-doc blowup),
    # never a term-cross-term nested loop
    p = _splan(spark, sf_dir, "text_pmi")
    assert "CartesianProduct" not in p
    # the only nested-loop allowed is the one-row n_docs broadcast
    assert p.count("BroadcastNestedLoopJoin") <= 1, p


def test_events_transitions_single_events_shuffle(spark, sf_dir):
    # one lag-window exchange on user_id; the probability window runs
    # over the |types|^2 matrix, post-aggregation
    p = _splan(spark, sf_dir, "events_transitions")
    assert p.count("Exchange hashpartitioning(user_id") <= 1, p


def test_knn_classify_corpus_never_shuffles_before_scoring(spark, sf_dir):
    # score_against broadcasts the bounded query side: the corpus scan
    # feeds the scorer with no exchange; top-k prunes via the window
    # group limit before any label join
    p = _splan(spark, sf_dir, "knn_classify")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p, p  # broadcast query cross-score


def test_events_ohlc_single_exchange(spark, sf_dir):
    # both endpoint rank windows AND the final aggregate share one
    # hashpartitioning(event_type, _slot) exchange
    p = _splan(spark, sf_dir, "events_ohlc")
    assert p.count("Exchange hashpartitioning") == 1, p


def test_events_resample_grid_never_shuffles_events_twice(spark, sf_dir):
    # the event stream is exchanged once on (key, slot) — the rank
    # window and the per-slot aggregate share it; every later exchange
    # runs over the slot-grid-sized relations (bounds/fill), and the
    # grid->obs join must not be a cartesian
    p = _splan(spark, sf_dir, "events_resample")
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning(event_type#") <= 2, p
    assert p.count("Exchange hashpartitioning") <= 3, p


def test_tpch_q20_nested_in_chain_as_semi_joins(spark, sf_dir):
    # both IN levels must land as LEFT SEMI joins (part keys into the
    # lineitem scan, HAVING-filtered supplier keys into supplier) —
    # never an IN-list materialization or a nested loop
    p = _splan(spark, sf_dir, "tpch_q20_shape")
    assert p.count("LeftSemi") >= 2, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q17_correlated_avg_is_decorrelated(spark, sf_dir):
    # the per-part AVG threshold is ONE grouped aggregate joined back
    # on the part key — equi-joins only, zero per-row subqueries
    p = _splan(spark, sf_dir, "tpch_q17_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q7_nation_pair_disjunction_stays_equi(spark, sf_dir):
    # the cross-pair OR on the two nation roles is a residual filter
    # over equi-joins, never a nested loop over the fact chain
    p = _splan(spark, sf_dir, "tpch_q7_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q8_seven_relation_tree_stays_equi(spark, sf_dir):
    p = _splan(spark, sf_dir, "tpch_q8_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q9_no_nested_loop(spark, sf_dir):
    p = _splan(spark, sf_dir, "tpch_q9_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q12_cross_join_lateness_stays_residual(spark, sf_dir):
    # l_shipdate >= o_orderdate + 30d references both sides, so it must
    # ride the o_orderkey equi-join as a residual, not force a loop
    p = _splan(spark, sf_dir, "tpch_q12_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q2_min_equality_join_is_equi(spark, sf_dir):
    # the (partkey, min_price) join back is hash/sort-merge on the
    # composite equi keys; DISTINCT is an aggregate, not a loop
    p = _splan(spark, sf_dir, "tpch_q2_shape")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q11_and_q15_one_row_scalar_sides_only(spark, sf_dir):
    # the ONLY nested-loop allowed is the one-row scalar side (the
    # global threshold / MAX) — a single BroadcastNestedLoopJoin each
    for name in ("tpch_q11_shape", "tpch_q15_shape"):
        p = _splan(spark, sf_dir, name)
        assert "CartesianProduct" not in p
        assert p.count("BroadcastNestedLoopJoin") <= 1, (name, p)

