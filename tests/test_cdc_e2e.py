"""CDC end-to-end capstone (VERDICT r3 ask #4): the reference's nightly
job done incrementally. The reference (/root/reference/main.go:87-165)
re-reads the WHOLE MySQL table and rewrites the whole parquet file every
run; here an initial snapshot is written once and a STREAM of CDC delta
batches is folded in via foreachBatch + snapshot_merge — write-audit-
publish, zero snapshot-side shuffle — and the final snapshot must equal
the batch ground truth (replaying every event in sequence order).
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from mysql2parquet_spark.operators.merge import apply_cdc
from mysql2parquet_spark.streaming.sources import foreach_batch_sink

USERS = [  # key, name, balance — the initial table
    (1, "ann", 10.0),
    (2, "bo", 20.0),
    (3, "cy", 30.0),
    (4, "di", 40.0),
    (5, "ed", 50.0),
]

# Three CDC delta batches; seq is the binlog position. Covers: plain
# update, insert, delete, delete-then-reinsert WITHIN a batch (k=2 in
# batch 2), update-then-delete ACROSS batches (k=4), and a re-update of
# a previously inserted key (k=6).
BATCHES = [
    [  # batch 0
        (2, "bo2", 21.0, "U", 101),
        (6, "fi", 60.0, "I", 102),
    ],
    [  # batch 1
        (4, "di2", 41.0, "U", 201),
        (6, "fi2", 61.0, "U", 202),
    ],
    [  # batch 2: delete-then-reinsert k=2; delete k=4
        (2, None, None, "D", 301),
        (2, "bo3", 22.0, "I", 302),
        (4, None, None, "D", 303),
    ],
]

EVENT_SCHEMA = "k bigint, name string, bal double, op string, seq bigint"


def _ground_truth() -> set:
    state = {k: (n, b) for k, n, b in USERS}
    for batch in BATCHES:
        for k, n, b, op, _seq in sorted(batch, key=lambda e: e[4]):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (n, b)
    return {(k, n, b) for k, (n, b) in state.items()}


def _write_delta_files(spark, delta_dir: str) -> None:
    """One parquet file per CDC batch, with strictly ascending mtimes so
    the file-stream source replays them in order (same technique as
    tests/test_stream_join.py)."""
    os.makedirs(delta_dir, exist_ok=True)
    base = int(time.time()) - 3600
    for i, batch in enumerate(BATCHES):
        df = spark.createDataFrame(batch, EVENT_SCHEMA).coalesce(1)
        staging = f"{delta_dir}_stage{i}"
        df.write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(staging + "/part-*.parquet")
        dst = os.path.join(delta_dir, f"delta_{i:03d}.parquet")
        os.replace(part, dst)
        os.utime(dst, (base + 10 * i, base + 10 * i))


def test_cdc_incremental_export_equals_batch(spark, tmp_path):
    snap_root = str(tmp_path / "snap")
    spark.createDataFrame(USERS, "k bigint, name string, bal double").write.parquet(
        f"{snap_root}_v0"
    )

    delta_dir = str(tmp_path / "deltas")
    _write_delta_files(spark, delta_dir)

    versions = [0]
    plans: list[str] = []

    def fold(batch_df, batch_id):
        ss = batch_df.sparkSession
        cur = versions[-1]
        snapshot = ss.read.parquet(f"{snap_root}_v{cur}")
        merged = apply_cdc(snapshot, batch_df, ["k"])
        # simple mode — formatted omits inline exchange args, making a
        # key-substring assert vacuous (caught in review)
        jmode = ss._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        plans.append(merged._jdf.queryExecution().explainString(jmode))
        # write-audit-publish: never overwrite the snapshot being read
        merged.write.mode("errorifexists").parquet(f"{snap_root}_v{cur + 1}")
        versions.append(cur + 1)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )
    q = foreach_batch_sink(stream, str(tmp_path / "ckpt"), fold)
    q.processAllAvailable()
    q.stop()

    assert versions == [0, 1, 2, 3]  # one snapshot version per delta batch
    final = spark.read.parquet(f"{snap_root}_v{versions[-1]}")
    got = {(r.k, r.name, r.bal) for r in final.collect()}
    assert got == _ground_truth()

    # The at-scale contract: every per-batch merge is broadcast-anti +
    # union — the snapshot lineage is never shuffled on the merge key.
    assert plans, "foreachBatch never ran"
    from tests.conftest import target_feeds_anti_directly

    for p in plans:
        assert "BroadcastHashJoin" in p
        assert p.count("LeftAnti") >= 1
        assert "SortMergeJoin" not in p
        # structural pin: the snapshot FileScan feeds the anti-join
        # through narrow nodes only — a snapshot-lineage shuffle would
        # interpose Exchange/Sort. Delta-side compaction exchanges fine.
        assert target_feeds_anti_directly(p), p


def test_cdc_replay_is_idempotent_per_version(spark, tmp_path):
    """Re-folding the same delta batch over the same snapshot version
    yields the same next version (deterministic merge) — the recovery
    story after a failed publish step."""
    snap = str(tmp_path / "s0")
    spark.createDataFrame(USERS, "k bigint, name string, bal double").write.parquet(
        snap
    )
    events = spark.createDataFrame(BATCHES[2], EVENT_SCHEMA)
    a = apply_cdc(spark.read.parquet(snap), events, ["k"])
    b = apply_cdc(spark.read.parquet(snap), events, ["k"])
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_cdc_stream_folds_into_versioned_snapshots(spark, tmp_path):
    """The library-path composition: a CDC file stream folded via
    io.fold_cdc_snapshot per micro-batch — versioning, audit markers,
    and reader isolation all handled by the snapshot layout instead of
    hand-rolled paths. Final committed snapshot equals the ground
    truth."""
    from mysql2parquet_spark.io import (
        fold_cdc_snapshot,
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snaproot")
    publish_snapshot(
        spark.createDataFrame(USERS, "k bigint, name string, bal double"), root
    )

    delta_dir = str(tmp_path / "deltas2")
    _write_delta_files(spark, delta_dir)

    def fold(batch_df, batch_id):
        fold_cdc_snapshot(batch_df.sparkSession, root, batch_df, ["k"])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )
    q = foreach_batch_sink(stream, str(tmp_path / "ckpt2"), fold)
    q.processAllAvailable()
    q.stop()

    assert snapshot_versions(spark, root) == {0: True, 1: True, 2: True, 3: True}
    final = spark.read.parquet(latest_snapshot(spark, root))
    assert {(r.k, r.name, r.bal) for r in final.collect()} == _ground_truth()


def test_cdc_stream_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: fold batch 0, STOP, land two more
    delta files, restart with the SAME checkpoint — already-processed
    batches are not re-folded (no duplicate versions) and the final
    state equals the ground truth."""
    import glob as _glob

    from mysql2parquet_spark.io import (
        fold_cdc_snapshot,
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snaproot_r")
    publish_snapshot(
        spark.createDataFrame(USERS, "k bigint, name string, bal double"), root
    )

    staged = str(tmp_path / "staged")
    _write_delta_files(spark, staged)
    parts = sorted(_glob.glob(os.path.join(staged, "delta_*.parquet")))
    live = tmp_path / "live"
    live.mkdir()
    os.link(parts[0], live / "delta_000.parquet")  # only batch 0 visible

    ckpt = str(tmp_path / "ckpt_r")

    def fold(batch_df, batch_id):
        fold_cdc_snapshot(batch_df.sparkSession, root, batch_df, ["k"])

    def run_once():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(live))
        )
        q = foreach_batch_sink(stream, ckpt, fold)
        q.processAllAvailable()
        q.stop()

    run_once()
    assert snapshot_versions(spark, root) == {0: True, 1: True}

    os.link(parts[1], live / "delta_001.parquet")
    os.link(parts[2], live / "delta_002.parquet")
    run_once()  # same checkpoint: batch 0 must NOT re-fold

    assert snapshot_versions(spark, root) == {
        0: True, 1: True, 2: True, 3: True,
    }
    final = spark.read.parquet(latest_snapshot(spark, root))
    assert {(r.k, r.name, r.bal) for r in final.collect()} == _ground_truth()
