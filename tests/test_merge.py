"""MERGE/upsert + CDC compaction (operators/merge.py) — the
incremental-export half of the reference's nightly job
(/root/reference/main.go:87-165 re-exports the whole table each run;
we fold deltas instead). Covers the upsert/insert/delete matrix,
standard-MERGE duplicate-source errors, last-event-wins ordering,
delete-then-reinsert batches, and the zero-target-shuffle plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.merge import (
    apply_cdc,
    compact_cdc_batch,
    merge_upsert,
    snapshot_merge,
)


def _target(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"), Row(k=4, v="d")]
    )


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_upsert_insert_delete_matrix(spark):
    src = spark.createDataFrame([Row(k=2, v="B"), Row(k=5, v="E")])
    dels = spark.createDataFrame([(4,)], "k int")
    out = merge_upsert(_target(spark), src, ["k"], deletes=dels)
    # k=1,3 untouched; k=2 updated; k=5 inserted; k=4 deleted
    assert _rows(out) == [(1, "a"), (2, "B"), (3, "c"), (5, "E")]


def test_duplicate_source_keys_error_like_merge_into(spark):
    src = spark.createDataFrame([Row(k=2, v="B1"), Row(k=2, v="B2")])
    out = merge_upsert(_target(spark), src, ["k"])
    with pytest.raises(Exception, match="multiple source rows"):
        out.collect()


def test_order_col_last_event_wins(spark):
    src = spark.createDataFrame(
        [Row(k=2, v="old", seq=1), Row(k=2, v="new", seq=9), Row(k=5, v="E", seq=3)]
    )
    out = merge_upsert(
        _target(spark).withColumn("seq", F.lit(0)), src, ["k"], order_col="seq"
    )
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (1, "a"), (2, "new"), (3, "c"), (4, "d"), (5, "E"),
    ]


def test_key_in_source_and_deletes_ends_deleted(spark):
    src = spark.createDataFrame([Row(k=2, v="B")])
    dels = spark.createDataFrame([Row(k=2)])
    out = merge_upsert(_target(spark), src, ["k"], deletes=dels)
    assert _rows(out) == [(1, "a"), (3, "c"), (4, "d")]


def test_compact_cdc_delete_then_reinsert_survives(spark):
    events = spark.createDataFrame(
        [
            (2, None, "D", 10),
            (2, "reborn", "I", 11),
            (3, "gone", "D", 12),
            (3, "x", "U", 5),  # stale update BEFORE the delete
        ],
        "k bigint, v string, op string, seq bigint",
    )
    ups, dels = compact_cdc_batch(events, ["k"])
    assert sorted((r.k, r.v) for r in ups.collect()) == [(2, "reborn")]
    assert [r.k for r in dels.collect()] == [3]

    out = apply_cdc(_target(spark), events, ["k"])
    assert _rows(out) == [(1, "a"), (2, "reborn"), (4, "d")]


def test_compact_cdc_null_op_errors_not_silently_drops(spark):
    """A NULL op matches neither the upsert nor the delete filter — the
    event would vanish from the snapshot. Must fail the job instead."""
    events = spark.createDataFrame(
        [(2, "x", None, 10)], "k bigint, v string, op string, seq bigint"
    )
    ups, dels = compact_cdc_batch(events, ["k"])
    with pytest.raises(Exception, match="NULL op"):
        ups.collect()


def test_missing_keys_and_bad_order_col_fail_fast(spark):
    with pytest.raises(ValueError, match="at least one key"):
        merge_upsert(_target(spark), _target(spark), [])
    with pytest.raises(ValueError, match="missing"):
        merge_upsert(_target(spark), _target(spark), ["nope"])
    with pytest.raises(ValueError, match="order_col"):
        merge_upsert(_target(spark), _target(spark), ["k"], order_col="nope")
    with pytest.raises(ValueError, match="not in events"):
        compact_cdc_batch(_target(spark), ["k"])


def test_broadcast_merge_never_shuffles_target(spark, tmp_path):
    """The CDC contract at 100 TB: snapshot side is scan + broadcast-anti
    + union — zero Exchange on the target lineage."""
    snap = str(tmp_path / "snap")
    _target(spark).write.parquet(snap)
    delta = spark.createDataFrame([Row(k=2, v="B"), Row(k=9, v="Z")])
    out = snapshot_merge(
        spark, snap, delta, ["k"], order_col="v"  # unique keys; any order col
    )
    # simple mode, not formatted — formatted hides exchange arguments on
    # a separate line and key-substring asserts pass vacuously. The pin
    # is structural: the snapshot FileScan must feed the anti-join
    # DIRECTLY (no Exchange between); delta-side window exchanges are
    # allowed.
    from tests.conftest import target_feeds_anti_directly

    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = out._jdf.queryExecution().explainString(jmode)
    assert "BroadcastHashJoin" in plan
    assert plan.count("LeftAnti") >= 1
    assert "SortMergeJoin" not in plan
    assert target_feeds_anti_directly(plan), plan
    assert _rows(out) == [(1, "a"), (2, "B"), (3, "c"), (4, "d"), (9, "Z")]


def test_snapshot_merge_shuffle_fallback(spark, tmp_path):
    """broadcast_source=False (backfill-sized delta) must produce the
    same result via a shuffled anti-join."""
    snap = str(tmp_path / "snap2")
    _target(spark).write.parquet(snap)
    delta = spark.createDataFrame([Row(k=1, v="A")])
    out = snapshot_merge(spark, snap, delta, ["k"], broadcast_source=False)
    assert _rows(out) == [(1, "A"), (2, "b"), (3, "c"), (4, "d")]


# --------------------------------------------------------------------------
# Property: apply_cdc over ANY event batch == sequential dict replay
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(st.integers(min_value=0, max_value=7), st.sampled_from("IUD")),
        min_size=1,
        max_size=25,
    )
)
def test_apply_cdc_matches_sequential_replay(spark, ops):
    """For ANY interleaving of insert/update/delete events (including
    repeated keys, delete-then-reinsert chains, deletes of absent keys),
    the distributed one-shot merge equals replaying the events one at a
    time in sequence order."""
    target_rows = [(k, f"base{k}") for k in range(5)]
    events = [
        (k, None if op == "D" else f"v{i}", op, i) for i, (k, op) in enumerate(ops)
    ]

    state = dict(target_rows)
    for k, v, op, _seq in events:  # events already in seq order
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    expected = set(state.items())

    target = spark.createDataFrame(target_rows, "k bigint, v string")
    ev = spark.createDataFrame(events, "k bigint, v string, op string, seq bigint")
    got = {(r.k, r.v) for r in apply_cdc(target, ev, ["k"]).collect()}
    assert got == expected


def test_compact_cdc_superseded_null_op_is_harmless(spark):
    """A NULL-op event that a later event supersedes must NOT abort the
    batch — only a NULL op as the FINAL event per key is an error
    (review finding: the guard belongs after compaction)."""
    events = spark.createDataFrame(
        [(5, None, None, 1), (5, "fixed", "U", 2)],
        "k bigint, v string, op string, seq bigint",
    )
    ups, dels = compact_cdc_batch(events, ["k"])
    assert [(r.k, r.v) for r in ups.collect()] == [(5, "fixed")]
    assert dels.count() == 0


# ---------------------------------------------------------------------------
# SCD Type 2 history fold + point-in-time lookup
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.merge import scd2_asof, scd2_history


def _scd2_fixture(spark):
    # key 1: two updates then a delete (no current version)
    # key 2: single insert (one open version)
    # key 3: update, delete, re-insert (history resumes after the gap)
    events = [
        (1, "a", "U", 10),
        (1, "b", "U", 20),
        (1, None, "D", 30),
        (2, "x", "U", 15),
        (3, "p", "U", 5),
        (3, None, "D", 12),
        (3, "q", "U", 40),
    ]
    return spark.createDataFrame(events, "k bigint, v string, op string, seq bigint")


def test_scd2_history_intervals_and_current(spark):
    hist = scd2_history(_scd2_fixture(spark), ["k"], seq_col="seq", op_col="op")
    rows = {
        (r.k, r.v): (r.effective_from, r.effective_to, r.is_current)
        for r in hist.collect()
    }
    assert rows == {
        (1, "a"): (10, 20, 0),
        (1, "b"): (20, 30, 0),  # closed by the delete, emits no row itself
        (2, "x"): (15, None, 1),
        (3, "p"): (5, 12, 0),
        (3, "q"): (40, None, 1),  # re-insert after delete reopens history
    }
    # deleted key 1 has NO current version
    assert hist.filter((F.col("k") == 1) & (F.col("is_current") == 1)).count() == 0


def test_scd2_history_without_op_keeps_every_event(spark):
    """op_col=None: a pure attribute-change log (no tombstones) — every
    event is a version."""
    ev = spark.createDataFrame(
        [(7, "a", 1), (7, "b", 2)], "k bigint, v string, seq bigint"
    )
    hist = scd2_history(ev, ["k"], seq_col="seq")
    got = sorted((r.v, r.effective_from, r.effective_to) for r in hist.collect())
    assert got == [("a", 1, 2), ("b", 2, None)]


def test_scd2_history_duplicate_ordering_fails_loudly(spark):
    ev = spark.createDataFrame(
        [(1, "a", "U", 10), (1, "b", "U", 10)],
        "k bigint, v string, op string, seq bigint",
    )
    with pytest.raises(Exception, match="duplicate event ordering"):
        scd2_history(ev, ["k"], seq_col="seq", op_col="op").collect()
    # the same data passes once a tiebreak gives a total order
    ev2 = ev.withColumn("eid", F.monotonically_increasing_id())
    assert (
        scd2_history(
            ev2, ["k"], seq_col="seq", op_col="op", tiebreak_cols=["eid"]
        ).count()
        == 2
    )


@pytest.mark.parametrize(
    ("as_of", "expected"),
    [
        (4, set()),  # before any event
        (10, {(1, "a"), (3, "p")}),  # inclusive at effective_from
        (25, {(1, "b"), (2, "x"), (3, None)}),  # 3 is deleted at 12
        (30, {(2, "x"), (3, None)}),  # 1's delete is visible AT its instant
        (99, {(2, "x"), (3, "q")}),
    ],
)
def test_scd2_asof_point_in_time(spark, as_of, expected):
    hist = scd2_history(_scd2_fixture(spark), ["k"], seq_col="seq", op_col="op")
    live = scd2_asof(hist, as_of)
    got = {(r.k, r.v) for r in live.collect()}
    expected = {(k, v) for k, v in expected if v is not None}
    assert got == expected
    # at most one live version per key, by construction
    assert live.groupBy("k").count().filter(F.col("count") > 1).count() == 0


def test_scd2_single_shuffle(spark):
    """The fold is ONE exchange on the key — rebuilding history at scale
    is a single pass, not a self-join."""
    hist = scd2_history(_scd2_fixture(spark), ["k"], seq_col="seq", op_col="op")
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ops=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), st.sampled_from("UD")),
        min_size=1,
        max_size=20,
    ),
    probe=st.integers(min_value=0, max_value=21),
)
def test_scd2_asof_matches_sequential_replay(spark, ops, probe):
    """For ANY interleaving of update/delete events, point-in-time
    lookup over the SCD2 history equals replaying events up to (and
    including) the probe instant — the timeline semantics a dimension
    consumer relies on."""
    events = [
        (k, None if op == "D" else f"v{i}", op, i) for i, (k, op) in enumerate(ops)
    ]
    state: dict = {}
    for k, v, op, seq in events:
        if seq > probe:
            break
        state.pop(k, None) if op == "D" else state.update({k: v})
    expected = set(state.items())

    ev = spark.createDataFrame(events, "k bigint, v string, op string, seq bigint")
    hist = scd2_history(ev, ["k"], seq_col="seq", op_col="op")
    got = {(r.k, r.v) for r in scd2_asof(hist, probe).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# scd2_apply_batch — incremental history maintenance
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.merge import scd2_apply_batch

_SCD2_DDL = "k bigint, v string, op string, seq bigint"

_B0 = [(1, "a", "U", 10), (2, "x", "U", 15), (3, "p", "U", 5)]
_B1 = [(1, "b", "U", 20), (3, None, "D", 12)]     # update 1; delete 3
_B2 = [(1, None, "D", 30), (3, "q", "U", 40), (4, "n", "U", 35)]  # del 1, rebirth 3, new 4


def _hist_set(df):
    return {
        (r.k, r.v, r.effective_from, r.effective_to, r.is_current)
        for r in df.collect()
    }


def test_scd2_apply_batch_equals_full_refold(spark):
    """Chained incremental folds over three CDC batches must equal
    scd2_history over the concatenated log — including deletes,
    re-inserts after deletes, brand-new keys, and untouched keys."""
    hist = scd2_history(
        spark.createDataFrame(_B0, _SCD2_DDL), ["k"], seq_col="seq", op_col="op"
    )
    for batch in (_B1, _B2):
        ev = spark.createDataFrame(batch, _SCD2_DDL)
        hist = scd2_apply_batch(hist, ev, ["k"], seq_col="seq", op_col="op")
    full = scd2_history(
        spark.createDataFrame(_B0 + _B1 + _B2, _SCD2_DDL),
        ["k"],
        seq_col="seq",
        op_col="op",
    )
    assert _hist_set(hist) == _hist_set(full)


def test_scd2_apply_batch_preserves_untouched_keys_without_refold(spark):
    """A key with no event in the batch passes through bit-identically
    (closed AND open rows), proving the fold is delta-shaped."""
    hist = scd2_history(
        spark.createDataFrame(_B0, _SCD2_DDL), ["k"], seq_col="seq", op_col="op"
    )
    ev = spark.createDataFrame([(1, "b", "U", 20)], _SCD2_DDL)
    out = scd2_apply_batch(hist, ev, ["k"], seq_col="seq", op_col="op")
    before = {t for t in _hist_set(hist) if t[0] != 1}
    after = {t for t in _hist_set(out) if t[0] != 1}
    assert before == after


def test_scd2_apply_batch_validates_history_shape(spark):
    ev = spark.createDataFrame(_B0, _SCD2_DDL)
    with pytest.raises(ValueError, match="not an scd2_history output"):
        scd2_apply_batch(ev, ev, ["k"], seq_col="seq", op_col="op")


def test_scd2_null_op_fails_loudly(spark):
    """Review finding: a NULL op satisfied neither filter branch and
    silently vanished, leaving an interval hole — must error like
    compact_cdc_batch does."""
    ev = spark.createDataFrame(
        [(1, "a", "U", 10), (1, "b", None, 20), (1, "c", "U", 30)],
        "k bigint, v string, op string, seq bigint",
    )
    with pytest.raises(Exception, match="NULL op"):
        scd2_history(ev, ["k"], seq_col="seq", op_col="op").collect()


def test_scd2_apply_batch_shuffled_and_no_op_variants(spark):
    """The backfill-sized escape hatch (broadcast_touched=False) and the
    pure attribute-log form (op_col=None) both hold the refold
    equivalence."""
    b0 = [(1, "a", 10), (2, "x", 15)]
    b1 = [(1, "b", 20), (3, "n", 25)]
    ddl = "k bigint, v string, seq bigint"
    hist = scd2_history(spark.createDataFrame(b0, ddl), ["k"], seq_col="seq")
    out = scd2_apply_batch(
        hist,
        spark.createDataFrame(b1, ddl),
        ["k"],
        seq_col="seq",
        broadcast_touched=False,
    )
    full = scd2_history(spark.createDataFrame(b0 + b1, ddl), ["k"], seq_col="seq")
    assert _hist_set(out) == _hist_set(full)
