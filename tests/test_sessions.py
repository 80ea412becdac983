"""D84: batch gap-based sessionization — gaps-and-islands with the
30-minute idle timeout."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.sequences import gap_sessions


def _ev(eid, minutes, user, value=1.0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes),
        user_id=user,
        event_type="view",
        value=float(value),
    )


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows)
    got = gap_sessions(df, **kw).collect()
    return {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["duration_s"],
            round(r["total_value"], 2),
        )
        for r in got
    }


def test_gap_splits_sessions(spark):
    rows = [
        _ev(1, 0, 1),
        _ev(2, 10, 1),   # 10 min gap: same session
        _ev(3, 50, 1),   # 40 min gap: NEW session
        _ev(4, 55, 1),
        _ev(5, 0, 2),    # other user: own session numbering
    ]
    got = _run(spark, rows)
    assert got[(1, 1)] == (2, 600, 2.0)
    assert got[(1, 2)] == (2, 300, 2.0)
    assert got[(2, 1)] == (1, 0, 1.0)


def test_exact_gap_boundary_is_same_session(spark):
    # ts > prev + 30min splits; EXACTLY 30min does not
    rows = [_ev(1, 0, 1), _ev(2, 30, 1), _ev(3, 60, 1)]
    got = _run(spark, rows)
    assert got == {(1, 1): (3, 3600, 3.0)}


def test_same_instant_ties_break_by_event_id(spark):
    rows = [_ev(2, 0, 1), _ev(1, 0, 1), _ev(3, 5, 1)]
    got = _run(spark, rows)
    assert got == {(1, 1): (3, 300, 3.0)}


def test_matches_python_twin_on_fixture(spark, sf_dir):
    from mysql2parquet_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["value"])
        for r in ev.collect()
    )
    by_user: dict = {}
    for u, ts, eid, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    ref = {}
    for u, evs in by_user.items():
        evs.sort()
        idx, start, end, n, tot = 0, None, None, 0, Decimal("0")
        for ts, _, v in evs:
            if start is None or ts > end + dt.timedelta(minutes=30):
                if start is not None:
                    ref[(u, idx)] = (
                        n,
                        int((end - start).total_seconds()),
                        float(tot),
                    )
                idx += 1
                start, end, n, tot = ts, ts, 0, Decimal("0")
            end = max(end, ts)
            n += 1
            tot += Decimal(str(round(v, 2)))
        ref[(u, idx)] = (
            n, int((end - start).total_seconds()), float(tot)
        )
    got = _run(spark, [
        Row(event_id=eid, ts=ts, user_id=u, value=v)
        for u, ts, eid, v in rows
    ])
    assert got == ref


def test_validation(spark):
    df = spark.createDataFrame([_ev(1, 0, 1)])
    with pytest.raises(ValueError, match="gap_minutes"):
        gap_sessions(df, gap_minutes=0)


def test_plan_single_window_operator(spark, sf_dir):
    from mysql2parquet_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    out = gap_sessions(ev)
    p = out._jdf.queryExecution().executedPlan().toString()
    # lag + running sum share ONE user-keyed exchange and ONE sort
    # (the boundary-sum Window reuses the lag Window's partitioning
    # and ordering — the scale property; the node count is two)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("+- Sort ") == 1, p
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
