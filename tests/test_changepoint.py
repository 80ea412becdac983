"""D94: CUSUM changepoint report — Decimal-exact Python twin +
planted-shift detection tests."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from mysql2parquet_spark.operators.sequences import cusum_changepoint

_T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _py_cusum(rows):
    groups: dict = {}
    for g, eid, ts, v in rows:
        if v is None:
            continue
        groups.setdefault(g, []).append(
            (ts, eid, Decimal(str(v)).quantize(Decimal("0.01")))
        )
    out = {}
    for g, series in groups.items():
        series.sort()
        n = len(series)
        tot = sum(v for _, _, v in series)
        best = None
        p = Decimal(0)
        for k, (ts, eid, v) in enumerate(series, start=1):
            p += v
            abs_t = abs(n * p - k * tot)
            key = (-abs_t, k)
            if best is None or key < best[0]:
                best = (key, eid, ts, k, abs_t)
        _, eid, ts, k, abs_t = best
        out[g] = (
            n,
            eid,
            ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
            k,
            math.floor(float(abs_t) / n * 1_000_000.0),
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "grp string, event_id bigint, ts timestamp, value double"
    )
    got = cusum_changepoint(
        df, "value", ["grp"], ts_col="ts", id_col="event_id"
    ).collect()
    return {
        r["grp"]: (
            r["n_rows"],
            r["cp_event_id"],
            r["cp_ts"],
            r["cp_k"],
            r["cusum_micro"],
        )
        for r in got
    }


def _ts(i):
    return _T0 + dt.timedelta(minutes=i)


def test_finds_planted_level_shift(spark):
    # 20 values at 10.0 then 20 at 30.0: CUSUM peaks exactly at the
    # boundary (k = 20)
    rows = [("a", i, _ts(i), 10.0) for i in range(20)]
    rows += [("a", 20 + i, _ts(20 + i), 30.0) for i in range(20)]
    got = _run(spark, rows)
    assert got == _py_cusum(rows)
    assert got["a"][3] == 20  # cp_k at the shift boundary
    assert got["a"][1] == 19  # last pre-shift event carries the peak


def test_matches_twin_with_ties_and_nulls(spark):
    rows = [
        ("a", 1, _ts(0), 5.0),
        ("a", 2, _ts(0), 7.0),  # same instant: id breaks the tie
        ("a", 3, _ts(1), None),  # NULL excluded from the series
        ("a", 4, _ts(2), 6.0),
        ("b", 1, _ts(0), 1.0),
        ("b", 2, _ts(1), 1.0),  # constant series: T_k = 0 everywhere
    ]
    got = _run(spark, rows)
    assert got == _py_cusum(rows)
    # constant series: ties on |T| = 0 resolve to the earliest k
    assert got["b"][3] == 1
    assert got["b"][4] == 0


def test_matches_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", "ts", "value"
    )
    rows = [
        (r["event_type"], r["event_id"], r["ts"], r["value"])
        for r in df.collect()
    ]
    got = {
        r["event_type"]: (
            r["n_rows"],
            r["cp_event_id"],
            r["cp_ts"],
            r["cp_k"],
            r["cusum_micro"],
        )
        for r in cusum_changepoint(df, "value", ["event_type"]).collect()
    }
    assert got == _py_cusum(rows)
