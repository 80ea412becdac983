"""Local parity gate for the r7-STAGED queries (queries/staged.py).

The r6 registry freeze (test_no_new_queries_while_backlog) keeps these
out of REGISTRY until the adjudication backlog drains, but they must
meet the full driver bar BEFORE registration: same strict comparison as
tests/test_oracle_parity.py — row count, column names, per-column value
TYPE classes, order-insensitive canonical values — via the shared
``mysql2parquet_spark.canon`` code path. r7 registration is then a
mechanical move (STAGED entries into REGISTRY + head slots)."""

from __future__ import annotations

import pytest

from mysql2parquet_spark.canon import canon as _canon
from mysql2parquet_spark.canon import column_type_classes as _column_type_classes
from mysql2parquet_spark.queries import REGISTRY, _load
from mysql2parquet_spark.queries.staged import STAGED

_load()

ORACLE_CASES = sorted(n for n, q in STAGED.items() if q.oracle is not None)


def test_staged_names_do_not_collide():
    dup = set(STAGED) & set(REGISTRY)
    assert not dup, f"staged queries already registered: {sorted(dup)}"


def test_all_staged_queries_have_oracles():
    # Staging exists to PROVE the oracle before registration; a staged
    # rows-only query would be registered rows-only directly instead.
    missing = [n for n, q in STAGED.items() if q.oracle is None]
    assert not missing, f"staged queries without oracles: {missing}"


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_staged_oracle_parity(spark, duck, sf_dir, name):
    q = STAGED[name]
    sdf = q.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck.execute(q.oracle)
    dcols = [c[0] for c in rel.description]
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} != {len(drows)}"
    )
    assert len(drows) > 0, f"{name}: oracle returned 0 rows — vacuous parity"
    stypes = _column_type_classes([tuple(r) for r in srows], scols)
    dtypes = _column_type_classes(drows, dcols)
    type_mismatch = {
        c: (sorted(stypes[c]), sorted(dtypes[c]))
        for c in scols
        if stypes[c] != dtypes[c]
    }
    assert not type_mismatch, (
        f"{name}: per-column value-type classes differ "
        f"(spark, duckdb): {type_mismatch}"
    )
    sc = _canon([tuple(r) for r in srows], scols)
    dc = _canon(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


# --- plan pins for the staged set (same bar as the registered head) -------


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


def test_events_anomaly_single_shuffle(spark, sf_dir):
    p = _splan(spark, sf_dir, "events_anomaly")
    assert p.count("Exchange hashpartitioning") <= 1, p


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


def test_staged_queries_output_scalar_columns(spark, sf_dir):
    # the head-shape lint (test_registry.py) applied BEFORE registration:
    # staged queries are r7 head candidates, so no top-level
    # Array/Map/Struct (unhashable in the driver's pandas sort) or
    # Decimal (asymmetric canonicalization — the agg_salted hash-FAIL
    # class) may reach their output schemas. Only schema is inspected.
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad = {}
    for name, q in STAGED.items():
        df = q.fn(spark, sf_dir)
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
        f"staged queries with shape-unsafe top-level columns: {bad}"
    )
