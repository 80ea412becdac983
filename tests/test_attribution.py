"""D78: last-touch conversion attribution — as-of credited channels
with an exact revenue rollup."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.sequences import last_touch_attribution


def _ev(eid, ts, user, etype, value):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=ts),
        user_id=user,
        event_type=etype,
        value=float(value),
    )


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows)
    got = last_touch_attribution(df, **kw).collect()
    return {
        r["channel"]: (r["n_conversions"], round(r["revenue"], 2))
        for r in got
    }


def test_credit_rules(spark):
    rows = [
        # user 1: view then click then purchase -> click credited
        _ev(1, 0, 1, "view", 0),
        _ev(2, 1, 1, "click", 0),
        _ev(3, 2, 1, "purchase", 10.5),
        # user 2: touch 200h before purchase -> outside 168h lookback
        _ev(4, 0, 2, "click", 0),
        _ev(5, 200, 2, "purchase", 5.25),
        # user 3: no touch at all
        _ev(6, 3, 3, "purchase", 1.0),
        # user 4: touch at the SAME instant as the purchase -> inclusive
        _ev(7, 4, 4, "view", 0),
        _ev(8, 4, 4, "purchase", 2.0),
    ]
    got = _run(spark, rows)
    assert got["click"] == (1, 10.5)
    assert got["view"] == (1, 2.0)
    assert got["unattributed"] == (2, 6.25)


def test_same_instant_touches_dedupe_by_max_event_id(spark):
    rows = [
        _ev(10, 0, 1, "view", 0),
        _ev(11, 0, 1, "click", 0),  # same ts, higher id -> wins
        _ev(12, 1, 1, "purchase", 3.0),
    ]
    got = _run(spark, rows)
    assert got == {"click": (1, 3.0)}


def test_last_touch_beats_first_touch(spark):
    rows = [
        _ev(1, 0, 1, "click", 0),
        _ev(2, 5, 1, "view", 0),  # most recent -> view credited
        _ev(3, 6, 1, "purchase", 7.0),
    ]
    got = _run(spark, rows)
    assert got == {"view": (1, 7.0)}


def test_revenue_is_exact_decimal_sum(spark):
    # 0.1-style doubles: the DECIMAL(18,2) path must sum exactly
    rows = [_ev(1, 0, 1, "click", 0)]
    rows += [_ev(10 + i, 1, 1, "purchase", 0.1) for i in range(10)]
    got = _run(spark, rows)
    assert got == {"click": (10, 1.0)}


def test_matches_python_twin_on_fixture(spark, sf_dir):
    from mysql2parquet_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in ev.collect()
    ]
    got = {
        r["channel"]: (r["n_conversions"], round(r["revenue"], 2))
        for r in last_touch_attribution(ev).collect()
    }
    # twin
    touches: dict = {}
    for eid, ts, u, et, _ in rows:
        if et in ("click", "view"):
            key = (u, ts)
            if key not in touches or eid > touches[key][0]:
                touches[key] = (eid, et)
    by_user: dict = {}
    for (u, ts), (_, et) in touches.items():
        by_user.setdefault(u, []).append((ts, et))
    for u in by_user:
        by_user[u].sort()
    ref: dict = {}
    for eid, ts, u, et, val in rows:
        if et != "purchase":
            continue
        ch = "unattributed"
        cand = [x for x in by_user.get(u, []) if x[0] <= ts]
        if cand:
            tts, tet = cand[-1]
            if tts >= ts - dt.timedelta(hours=168):
                ch = tet
        n, rev = ref.get(ch, (0, Decimal("0")))
        ref[ch] = (
            n + 1,
            rev + Decimal(str(round(val, 2))).quantize(Decimal("0.01")),
        )
    ref = {k: (n, float(v)) for k, (n, v) in ref.items()}
    assert got == ref


def test_validation(spark):
    df = spark.createDataFrame([_ev(1, 0, 1, "purchase", 1.0)])
    with pytest.raises(ValueError, match="lookback"):
        last_touch_attribution(df, lookback_hours=0)
