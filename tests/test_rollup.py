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
