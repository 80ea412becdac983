"""Incremental aggregate maintenance: folding a snapshot diff into a
persisted rollup must equal recomputing the rollup from the new
snapshot — including group births, deaths, and rows MOVING between
groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql2parquet_spark.io import publish_snapshot, snapshot_diff
from mysql2parquet_spark.operators.rollup import (
    aggregate_snapshot,
    incremental_agg_update,
)

DDL = "k bigint, grp string, qty bigint, price double"

V0 = [
    (1, "a", 10, 1.5),
    (2, "a", 20, 2.5),
    (3, "b", 30, 3.0),
    (4, "b", 40, 4.0),
    (5, "c", 50, 5.0),  # entire group c dies in v1
]
V1 = [
    (1, "a", 10, 1.5),   # unchanged
    (2, "b", 20, 2.5),   # U: MOVES group a -> b
    (3, "b", 33, 3.25),  # U: in-place value change
    # 4 deleted
    (6, "d", 60, 6.0),   # I: births group d
    (7, "a", 70, 7.0),   # I into existing group
]


def _rollup_eq(got, want):
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w, f"\ngot:  {sorted(g)}\nwant: {sorted(w)}"


def test_incremental_update_equals_recompute(spark, tmp_path):
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)

    sums = {"total_qty": "qty", "total_price": "price"}
    old = aggregate_snapshot(spark.createDataFrame(V0, DDL), ["grp"], sums)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    got = incremental_agg_update(old, diff, ["grp"], sums)
    want = aggregate_snapshot(spark.createDataFrame(V1, DDL), ["grp"], sums)
    _rollup_eq(got, want)
    # group c died (cnt hit zero) and never appears; d was born
    grps = {r.grp for r in got.collect()}
    assert "c" not in grps and "d" in grps


def test_incremental_update_chains_across_versions(spark, tmp_path):
    """v0→v1→v2 folded one diff at a time equals the v2 recompute —
    the nightly loop."""
    V2 = [(1, "a", 11, 1.0), (6, "d", 60, 6.0), (8, "e", 80, 8.0)]
    root = str(tmp_path / "snap")
    for rows in (V0, V1, V2):
        publish_snapshot(spark.createDataFrame(rows, DDL), root)
    sums = {"total_qty": "qty"}
    roll = aggregate_snapshot(spark.createDataFrame(V0, DDL), ["grp"], sums)
    for a, b in ((0, 1), (1, 2)):
        d = snapshot_diff(spark, root, a, b, ["k"], include_old=True)
        roll = incremental_agg_update(roll, d, ["grp"], sums)
    _rollup_eq(
        roll, aggregate_snapshot(spark.createDataFrame(V2, DDL), ["grp"], sums)
    )


def test_empty_diff_is_identity(spark, tmp_path):
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    sums = {"total_qty": "qty"}
    old = aggregate_snapshot(spark.createDataFrame(V0, DDL), ["grp"], sums)
    diff = snapshot_diff(spark, root, 0, 0, ["k"], include_old=True)
    _rollup_eq(incremental_agg_update(old, diff, ["grp"], sums), old)


def test_update_validates_diff_shape(spark, tmp_path):
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)
    old = aggregate_snapshot(
        spark.createDataFrame(V0, DDL), ["grp"], {"total_qty": "qty"}
    )
    bare = snapshot_diff(spark, root, 0, 1, ["k"])  # no include_old
    with pytest.raises(ValueError, match="include_old"):
        incremental_agg_update(old, bare, ["grp"], {"total_qty": "qty"})
    good = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    with pytest.raises(ValueError, match="group columns"):
        incremental_agg_update(old, good, [], {"total_qty": "qty"})
    with pytest.raises(ValueError, match="clash"):
        incremental_agg_update(old, good, ["cnt"], {"total_qty": "qty"})


def test_update_cost_is_delta_shaped(spark, tmp_path):
    """Plan pin: the old rollup is scanned ONCE and only joined — no
    second aggregation over it; the only hash aggregate consumes the
    (delta-sized) diff union."""
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)
    sums = {"total_qty": "qty"}
    old = aggregate_snapshot(spark.createDataFrame(V0, DDL), ["grp"], sums)
    # land the diff as a file first — the documented contract (the diff
    # is referenced twice; a lazy diff plan would re-run per side)
    dpath = str(tmp_path / "diff")
    snapshot_diff(spark, root, 0, 1, ["k"], include_old=True).write.parquet(dpath)
    diff = spark.read.parquet(dpath)
    plan = incremental_agg_update(
        old, diff, ["grp"], sums
    )._jdf.queryExecution().optimizedPlan().toString()
    # one Union (adds+subs), one merge join against the rollup, and the
    # only aggregate below the join consumes the delta-sized union
    assert plan.count("Union") == 1
    assert plan.count("Join FullOuter") == 1


def test_minmax_refused_without_snapshot(spark, tmp_path):
    """The honest-refusal contract survives: MIN/MAX without the new
    snapshot raises instead of answering wrong."""
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)
    old = aggregate_snapshot(
        spark.createDataFrame(V0, DDL), ["grp"], {"total_qty": "qty"},
        minmax_cols={"max_qty": ("max", "qty")},
    )
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    with pytest.raises(ValueError, match="snapshot_new"):
        incremental_agg_update(
            old, diff, ["grp"], {"total_qty": "qty"},
            minmax_cols={"max_qty": ("max", "qty")},
        )


def test_minmax_affected_groups_reaggregated(spark, tmp_path):
    """A delete exposes a new group max (b: 40 deleted, new max 33) —
    the affected-group fallback re-scans only touched groups and
    equals the full recompute, including a moved row's old AND new
    group and the untouched-group pass-through."""
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)
    sums = {"total_qty": "qty"}
    mm = {"max_qty": ("max", "qty"), "min_price": ("min", "price")}
    new = spark.createDataFrame(V1, DDL)
    old = aggregate_snapshot(spark.createDataFrame(V0, DDL), ["grp"], sums, mm)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    got = incremental_agg_update(
        old, diff, ["grp"], sums, minmax_cols=mm, snapshot_new=new
    )
    _rollup_eq(got, aggregate_snapshot(new, ["grp"], sums, mm))
    # the exposed-extremum case specifically: b's max fell 40 -> 33
    assert {r.grp: r.max_qty for r in got.collect()}["b"] == 33


def test_minmax_cost_is_affected_groups_only(spark, tmp_path):
    """Plan pin for the fallback's cost shape: the new snapshot is
    scanned through a LeftSemi against the delta-keyed affected set,
    and the old rollup contributes via LeftAnti pass-through — no
    full-table re-aggregation."""
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    old = aggregate_snapshot(
        spark.createDataFrame(V0, DDL), ["grp"], {}, {"max_qty": ("max", "qty")}
    )
    plan = incremental_agg_update(
        old, diff, ["grp"], {},
        minmax_cols={"max_qty": ("max", "qty")},
        snapshot_new=spark.createDataFrame(V1, DDL),
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_all_null_sum_group_stays_null(spark, tmp_path):
    """A group whose SUM is NULL (every value NULL) must come out of
    an update as NULL, exactly as a recompute would — including when
    the update doesn't touch that group at all."""
    ddl = "k bigint, grp string, qty bigint"
    v0 = [(1, "nullgrp", None), (2, "nullgrp", None), (3, "live", 7)]
    v1 = [(1, "nullgrp", None), (2, "nullgrp", None), (3, "live", 9),
          (4, "born", None)]
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(v0, ddl), root)
    publish_snapshot(spark.createDataFrame(v1, ddl), root)
    sums = {"total_qty": "qty"}
    old = aggregate_snapshot(spark.createDataFrame(v0, ddl), ["grp"], sums)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    got = incremental_agg_update(old, diff, ["grp"], sums)
    _rollup_eq(got, aggregate_snapshot(spark.createDataFrame(v1, ddl), ["grp"], sums))
    vals = {r.grp: r.total_qty for r in got.collect()}
    assert vals["nullgrp"] is None and vals["born"] is None and vals["live"] == 9


def test_null_group_key_is_a_group(spark, tmp_path):
    """NULL is a legitimate groupBy key; the fold must update it like
    any other group (both the abelian and the MIN/MAX path), not split
    or strand it on the non-matching side of the merge join."""
    ddl = "k bigint, grp string, qty bigint"
    v0 = [(1, None, 10), (2, None, 40), (3, "a", 5)]
    v1 = [(1, None, 10), (3, "a", 6), (4, None, 15)]  # 2 deleted: max falls
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(v0, ddl), root)
    publish_snapshot(spark.createDataFrame(v1, ddl), root)
    sums = {"total_qty": "qty"}
    new = spark.createDataFrame(v1, ddl)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    old_sum = aggregate_snapshot(spark.createDataFrame(v0, ddl), ["grp"], sums)
    _rollup_eq(
        incremental_agg_update(old_sum, diff, ["grp"], sums),
        aggregate_snapshot(new, ["grp"], sums),
    )
    mm = {"max_qty": ("max", "qty")}
    old_mm = aggregate_snapshot(spark.createDataFrame(v0, ddl), ["grp"], sums, mm)
    _rollup_eq(
        incremental_agg_update(
            old_mm, diff, ["grp"], sums, minmax_cols=mm, snapshot_new=new
        ),
        aggregate_snapshot(new, ["grp"], sums, mm),
    )


def test_bucketed_rollup_saves_the_rollup_side_exchange(spark, tmp_path):
    """The SCALE.md claim, proven comparatively: storing the rollup
    bucketed on its group columns removes exactly one Exchange from the
    incremental update (the rollup side of the merge join); the
    delta side still shuffles both times."""
    from mysql2parquet_spark.io import publish_snapshot, snapshot_diff, write_bucketed

    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(V0, DDL), root)
    publish_snapshot(spark.createDataFrame(V1, DDL), root)
    sums = {"total_qty": "qty"}
    dpath = str(tmp_path / "diff")
    snapshot_diff(spark, root, 0, 1, ["k"], include_old=True).write.parquet(dpath)
    diff = spark.read.parquet(dpath)

    plain = aggregate_snapshot(spark.createDataFrame(V0, DDL), ["grp"], sums)
    rpath = str(tmp_path / "rollup_plain")
    plain.write.parquet(rpath)
    write_bucketed(
        plain,
        "rollup_bucketed",
        bucket_by="grp",
        num_buckets=8,
        sort_by="grp",
        path=str(tmp_path / "rollup_bucketed"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def n_exchanges(old):
            upd = incremental_agg_update(old, diff, ["grp"], sums)
            return upd._jdf.queryExecution().executedPlan().toString().count("Exchange")

        n_plain = n_exchanges(spark.read.parquet(rpath))
        n_bucketed = n_exchanges(spark.table("rollup_bucketed"))
        assert n_bucketed == n_plain - 1, (n_plain, n_bucketed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS rollup_bucketed")


def test_delete_of_last_non_null_value_leaves_null_sum(spark, tmp_path):
    """The review-found transition: a group keeps NULL-valued rows but
    loses its last NON-NULL contributor — the folded SUM must come out
    NULL exactly like a recompute, not 0 (the nn_<out> companion count
    exists for precisely this case). Also the reverse: an insert giving
    an all-NULL group its first value flips NULL -> value."""
    ddl = "k bigint, grp string, qty bigint"
    v0 = [(1, "g", 5), (2, "g", None), (3, "h", None)]
    v1 = [(2, "g", None), (3, "h", None), (4, "h", 7)]  # g loses its value
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(v0, ddl), root)
    publish_snapshot(spark.createDataFrame(v1, ddl), root)
    sums = {"total_qty": "qty"}
    old = aggregate_snapshot(spark.createDataFrame(v0, ddl), ["grp"], sums)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    got = incremental_agg_update(old, diff, ["grp"], sums)
    want = aggregate_snapshot(spark.createDataFrame(v1, ddl), ["grp"], sums)
    _rollup_eq(got, want)
    by_grp = {r.grp: (r.cnt, r.total_qty) for r in got.collect()}
    assert by_grp["g"] == (1, None)  # not (1, 0)
    assert by_grp["h"] == (2, 7)


def test_old_rollup_without_nn_columns_is_refused(spark, tmp_path):
    """A pre-upgrade rollup (no nn_<out> companion) must fail loudly
    with re-bootstrap guidance, not fold into silent 0-vs-NULL drift."""
    ddl = "k bigint, grp string, qty bigint"
    v0 = [(1, "g", 5)]
    v1 = [(1, "g", 6)]
    root = str(tmp_path / "snap")
    publish_snapshot(spark.createDataFrame(v0, ddl), root)
    publish_snapshot(spark.createDataFrame(v1, ddl), root)
    diff = snapshot_diff(spark, root, 0, 1, ["k"], include_old=True)
    legacy = (
        spark.createDataFrame(v0, ddl)
        .groupBy("grp")
        .agg(F.count("*").alias("cnt"), F.sum("qty").alias("total_qty"))
    )
    with pytest.raises(ValueError, match="nn_total_qty"):
        incremental_agg_update(legacy, diff, ["grp"], {"total_qty": "qty"})
