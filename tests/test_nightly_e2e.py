"""Capstone: the full nightly-warehouse lifecycle over three simulated
nights, chaining every incremental surface end-to-end —

  audit gate → versioned snapshot publish → keyed diff → incremental
  rollup maintenance → SCD2 history fold → mergeable sketch sidecars

— and verifying at the end that EVERY derived artifact equals the
recompute-from-scratch answer. This is the workload the reference's
users run as N cron jobs plus hand-written diff scripts
(/root/reference/main.go:87-165 re-exports everything nightly); here it
is one pass per night with cost proportional to the changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import (
    publish_snapshot,
    read_snapshot,
    snapshot_diff,
    snapshot_versions,
)
from mysql2parquet_spark.operators.constraints import validate
from mysql2parquet_spark.operators.merge import scd2_apply_batch, scd2_history
from mysql2parquet_spark.operators.rollup import (
    aggregate_snapshot,
    incremental_agg_update,
)
from mysql2parquet_spark.operators.sketches import (
    distinct_sketches,
    merge_sketch_estimates,
)

DDL = "k bigint, grp string, qty bigint"

NIGHTS = [
    # night 0: initial load
    [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
    # night 1: 2 moves a->b with new qty, 4 deleted, 5 inserted
    [(1, "a", 10), (2, "b", 25), (3, "b", 30), (5, "c", 50)],
    # night 2: 3 changes qty in place, 1 deleted, 6 inserted into c
    [(2, "b", 25), (3, "b", 33), (5, "c", 50), (6, "c", 60)],
]

RULES = [
    {"type": "not_null", "cols": ["k"]},
    {"type": "unique", "cols": ["k"]},
    {"type": "expression", "name": "qty_pos", "expr": "qty > 0"},
]


def test_three_night_lifecycle_matches_recompute(spark, tmp_path):
    root = str(tmp_path / "warehouse")
    sums = {"total_qty": "qty"}

    rollup = None
    history = None
    sidecars = []

    for night, rows in enumerate(NIGHTS):
        batch = spark.createDataFrame(rows, DDL)

        # 1) audit gate: publish only clean data
        report = validate(batch, RULES)
        assert report.filter(F.col("violations") > 0).isEmpty(), f"night {night}"

        # 2) versioned publish
        publish_snapshot(batch, root)

        if night == 0:
            # bootstrap the derived artifacts
            rollup = aggregate_snapshot(batch, ["grp"], sums)
            history = scd2_history(
                batch.select("k", "grp", "qty", F.lit(night).alias("seq")),
                ["k"],
                seq_col="seq",
            )
        else:
            # 3) delta-shaped keyed diff between the two versions
            diff = snapshot_diff(
                spark, root, night - 1, night, ["k"], include_old=True
            )
            dpath = str(tmp_path / f"diff{night}")
            diff.write.parquet(dpath)  # land it: referenced twice below
            diff = spark.read.parquet(dpath)

            # 4) incremental rollup maintenance from the diff
            rollup = incremental_agg_update(rollup, diff, ["grp"], sums)

            # 5) SCD2 history maintenance from the SAME diff (I/U rows
            #    are this night's events; D rows are tombstones)
            events = diff.filter(F.col("change").isin("I", "U")).select(
                "k", "grp", "qty", F.lit(night).alias("seq"),
                F.lit("U").alias("op"),
            ).unionByName(
                diff.filter(F.col("change") == "D").select(
                    "k", "grp", "qty", F.lit(night).alias("seq"),
                    F.lit("D").alias("op"),
                )
            )
            history = scd2_apply_batch(
                history, events, ["k"], seq_col="seq", op_col="op"
            )

        # 6) sketch sidecar for tonight's export
        sidecars.append(distinct_sketches(batch, "k", []).withColumn(
            "night", F.lit(night)
        ))

    # ---- end state vs recompute-from-scratch -------------------------
    final = spark.createDataFrame(NIGHTS[-1], DDL)

    # snapshots: three committed versions; latest reads back exactly
    assert sorted(snapshot_versions(spark, root)) == [0, 1, 2]
    got_latest = {tuple(r) for r in read_snapshot(spark, root).collect()}
    assert got_latest == {tuple(r) for r in final.collect()}

    # rollup: incremental chain == recompute of night 2
    want_rollup = {
        tuple(r) for r in aggregate_snapshot(final, ["grp"], sums).collect()
    }
    assert {tuple(r) for r in rollup.collect()} == want_rollup

    # history: every key's current version equals the final snapshot,
    # and keys deleted along the way have no current version
    cur = {
        (r.k, r.grp, r.qty)
        for r in history.filter(F.col("is_current") == 1).collect()
    }
    assert cur == {(k, g, q) for k, g, q in NIGHTS[-1]}
    all_keys_ever = {k for rows in NIGHTS for k, _g, _q in rows}
    dead = all_keys_ever - {k for k, _g, _q in NIGHTS[-1]}
    for k in dead:
        assert (
            history.filter(
                (F.col("k") == k) & (F.col("is_current") == 1)
            ).count()
            == 0
        )
    # key 2 moved groups on night 1: its history carries both versions
    k2 = sorted(
        (r.grp, r.effective_from, r.effective_to)
        for r in history.filter(F.col("k") == 2).collect()
    )
    assert k2 == [("a", 0, 1), ("b", 1, None)]

    # sketches: merging the three nightly sidecars estimates the
    # distinct keys EVER seen — no export re-scan
    side = sidecars[0]
    for s_ in sidecars[1:]:
        side = side.unionByName(s_)
    est = merge_sketch_estimates(side, []).collect()[0]
    assert est.approx_distinct == len(all_keys_ever)  # tiny set: exact
    assert est.n_rows == sum(len(r) for r in NIGHTS)
