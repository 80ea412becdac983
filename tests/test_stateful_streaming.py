"""applyInPandasWithState (B35): custom per-key state across
micro-batches, checked against the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.streaming.sources import (
    read_events_path,
    run_to_memory,
    stream_events,
)
from mysql2parquet_spark.streaming.stateful import running_totals_per_user


def test_running_totals_match_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    got = run_to_memory(
        running_totals_per_user(stream), "stateful_totals", output_mode="update"
    )
    # update mode re-emits a row per (user, batch); the LAST emission per
    # user must equal the batch aggregate. With availableNow over one
    # file there is one batch, so take rows as-is.
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
    )
    got_map = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    want_map = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(got_map) == set(want_map)
    for uid, (n, tot) in want_map.items():
        gn, gtot = got_map[uid]
        assert gn == n
        assert abs(gtot - tot) < 0.02  # float accumulation in pandas path


# ---------------------------------------------------------------------------
# sessionize_with_timeout — event-time-timeout session finalization
# ---------------------------------------------------------------------------

import datetime
import glob as _glob
import os
import time

from mysql2parquet_spark.streaming.sources import stream_events_path
from mysql2parquet_spark.streaming.stateful import sessionize_with_timeout  # noqa: E402

_T0 = datetime.datetime(2024, 3, 1)


def _ev(uid, sec, eid):
    return (
        eid,
        _T0 + datetime.timedelta(seconds=sec),
        uid,
        "view",
        1.0,
        "{}",
    )


_EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

# gap=30s, watermark=10s. Session letters in comments track the
# assertions below.
_FILES = [
    [  # batch 1
        _ev(1, 100, 1), _ev(1, 110, 2), _ev(1, 120, 3),  # A: closes in-batch
        _ev(1, 200, 4), _ev(1, 205, 5),                  # B: stays open
        _ev(2, 150, 6),                                  # C: stays open
    ],
    [  # batch 2: watermark 195 → C (timeout 180) fires, B (235) survives
        _ev(3, 1000, 7),                                 # D opens
    ],
    [  # batch 3: watermark 990 → B fires; 2000-1000 gap closes D in-batch
        _ev(3, 2000, 8),                                 # E opens (never closes)
    ],
]


def _land_session_files(spark, directory):
    os.makedirs(directory, exist_ok=True)
    base = int(time.time()) - 3600
    for i, batch in enumerate(_FILES):
        df = spark.createDataFrame(batch, _EVENTS_DDL).coalesce(1)
        staging = f"{directory}_stage{i}"
        df.write.mode("overwrite").parquet(staging)
        (part,) = _glob.glob(staging + "/part-*.parquet")
        dst = os.path.join(directory, f"events_{i:03d}.parquet")
        os.replace(part, dst)
        os.utime(dst, (base + 10 * i, base + 10 * i))


def test_sessionize_timeout_emits_each_closed_session_once(spark, tmp_path):
    d = str(tmp_path / "sess_events")
    _land_session_files(spark, d)
    stream = stream_events_path(spark, d, max_files_per_trigger=1)
    sess = sessionize_with_timeout(stream, gap=30, watermark="10 seconds")
    got = run_to_memory(sess, "sess_timeout", output_mode="append")
    rows = sorted(
        (
            r.user_id,
            int((r.session_start - _T0).total_seconds()),
            int((r.session_end - _T0).total_seconds()),
            r.n_events,
        )
        for r in got.collect()
    )
    # A closed by the in-batch gap, C and B by watermark timeouts in
    # later batches, D by the in-batch gap in batch 3. E stays open
    # (nothing ever advances the watermark past it) — exactly-once,
    # append-only, no E.
    assert rows == [
        (1, 100, 120, 3),   # A
        (1, 200, 205, 2),   # B
        (2, 150, 150, 1),   # C
        (3, 1000, 1000, 1),  # D
    ]


def test_sessionize_closed_match_batch_session_window(spark, sf_dir, tmp_path):
    """Equivalence vs the batch F.session_window on real events: every
    emitted session matches a batch session exactly (same start, end+gap
    window, count); no session is emitted twice; and every batch session
    that is NOT its user's last must have been emitted (the stream can
    only leave per-user TAIL sessions open)."""
    d = str(tmp_path / "sess_real")
    os.makedirs(d, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = int(time.time()) - 3600
    raw.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s0"))
    (part,) = _glob.glob(str(tmp_path / "s0") + "/part-*.parquet")
    os.replace(part, os.path.join(d, "events_000.parquet"))
    os.utime(os.path.join(d, "events_000.parquet"), (base, base))

    gap = 1800  # 30 min — events are minutes apart, so sessions form
    stream = stream_events_path(spark, d, max_files_per_trigger=1)
    sess = sessionize_with_timeout(stream, gap=gap, watermark="10 seconds")
    got = run_to_memory(sess, "sess_real", output_mode="append").collect()

    batch = (
        read_events_path(spark, d)
        .groupBy("user_id", F.session_window("ts", f"{gap} seconds"))
        .agg(
            F.min("ts").alias("s"),
            F.max("ts").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    batch_set = {(r.user_id, r.s, r.e, r.n) for r in batch}
    got_list = [
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in got
    ]
    assert len(got_list) == len(set(got_list)), "duplicate session emitted"
    for s in got_list:
        assert s in batch_set, f"stream session {s} not a batch session"
    # non-tail batch sessions must all have been emitted
    last_per_user = {}
    for u, s, e, n in batch_set:
        if u not in last_per_user or s > last_per_user[u][1]:
            last_per_user[u] = (u, s, e, n)
    non_tail = {x for x in batch_set if x != last_per_user[x[0]]}
    missing = non_tail - set(got_list)
    assert not missing, f"{len(missing)} closed sessions never emitted"


def test_sessionize_out_of_order_event_widens_not_regresses(spark, tmp_path):
    """Review finding: a within-watermark late event that sorts BEFORE
    the open session's end must widen the session bounds (min/max), not
    regress session_end — the regressed end mis-times the timeout and
    splits later events into a phantom session."""
    files = [
        [_ev(1, 100, 1)],
        [_ev(1, 95, 2)],   # late but above watermark (100-10=90): merges
        [_ev(1, 200, 3)],  # closes the widened session, opens a new one
    ]
    d = str(tmp_path / "ooo_events")
    os.makedirs(d, exist_ok=True)
    base = int(time.time()) - 3600
    for i, batch in enumerate(files):
        df = spark.createDataFrame(batch, _EVENTS_DDL).coalesce(1)
        staging = f"{d}_stage{i}"
        df.write.mode("overwrite").parquet(staging)
        (part,) = _glob.glob(staging + "/part-*.parquet")
        dst = os.path.join(d, f"events_{i:03d}.parquet")
        os.replace(part, dst)
        os.utime(dst, (base + 10 * i, base + 10 * i))

    stream = stream_events_path(spark, d, max_files_per_trigger=1)
    sess = sessionize_with_timeout(stream, gap=30, watermark="10 seconds")
    got = run_to_memory(sess, "sess_ooo", output_mode="append")
    rows = sorted(
        (
            r.user_id,
            int((r.session_start - _T0).total_seconds()),
            int((r.session_end - _T0).total_seconds()),
            r.n_events,
        )
        for r in got.collect()
    )
    assert rows == [(1, 95, 100, 2)]


def test_sessionize_gap_boundary_matches_session_window(spark, tmp_path):
    """Review finding: an event exactly gap after its predecessor must
    start a NEW session (half-open, like F.session_window), not extend
    the old one."""
    files = [[_ev(1, 100, 1), _ev(1, 130, 2), _ev(1, 159, 3)]]  # 130-100 == gap
    d = str(tmp_path / "bound_events")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(files[0], _EVENTS_DDL).coalesce(1)
    staging = f"{d}_stage"
    df.write.mode("overwrite").parquet(staging)
    (part,) = _glob.glob(staging + "/part-*.parquet")
    os.replace(part, os.path.join(d, "events_000.parquet"))

    stream = stream_events_path(spark, d, max_files_per_trigger=1)
    sess = sessionize_with_timeout(stream, gap=30, watermark="10 seconds")
    got = run_to_memory(sess, "sess_bound", output_mode="append")
    rows = sorted(
        (
            int((r.session_start - _T0).total_seconds()),
            int((r.session_end - _T0).total_seconds()),
            r.n_events,
        )
        for r in got.collect()
    )
    # (100) closes in-batch at the boundary; (130,159) stays open
    # (159-130=29 < gap merges them)
    assert rows == [(100, 100, 1)]
