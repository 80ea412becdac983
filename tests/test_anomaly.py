"""Unit gates for operators/anomaly.py: planted spikes with closed-form
baselines, the exclude-own-row contract, min_history gating, the
constant-baseline break rule, volume anomalies, and the single-shuffle
plan shape."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.anomaly import (
    rolling_zscore,
    window_count_anomaly,
)


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(vals)],
        "k string, i int, v double",
    )


def test_planted_spike_flagged_with_exact_zscore(spark):
    # 20 alternating 9/11 readings (mean 10, pop-std 1), then a 16:
    # z = (16 - 10) / 1 = 6 exactly
    df = _series(spark, [9, 11] * 10 + [16])
    out = rolling_zscore(df, "v", ["k"], "i", lookback=20, min_history=10)
    rows = {r.i: r for r in out.collect()}
    spike = rows[20]
    assert spike.is_anomaly and spike.zscore == pytest.approx(6.0)
    assert spike.base_mean == 10.0 and spike.base_std == 1.0
    assert not any(r.is_anomaly for i, r in rows.items() if i < 20)


def test_row_excluded_from_own_baseline(spark):
    # if the spike leaked into its own baseline, the mean would be
    # pulled up and the std inflated — the exact 6.0 above already
    # proves exclusion; here the complementary direct check: baseline
    # of the row AFTER the spike includes it
    df = _series(spark, [9, 11] * 10 + [16, 10])
    out = {r.i: r for r in rolling_zscore(
        df, "v", ["k"], "i", lookback=50, min_history=10
    ).collect()}
    assert out[20].base_mean == 10.0          # spike's own baseline clean
    assert out[21].base_mean > 10.0           # next row's baseline sees 16


def test_min_history_gates_flags(spark):
    df = _series(spark, [10, 10, 10, 99])
    out = {r.i: r for r in rolling_zscore(
        df, "v", ["k"], "i", lookback=20, min_history=10
    ).collect()}
    # only 3 prior rows — no verdict, no z, no baseline emitted
    assert not out[3].is_anomaly
    assert out[3].zscore is None and out[3].base_mean is None


def test_constant_baseline_break_rule(spark):
    df = _series(spark, [10.0] * 12 + [10.5])
    out = {r.i: r for r in rolling_zscore(
        df, "v", ["k"], "i", lookback=20, min_history=10
    ).collect()}
    # zero-stddev baseline: z undefined (NULL), but the break IS flagged
    assert out[12].is_anomaly and out[12].zscore is None
    assert out[12].base_std == 0.0
    # ... and a continuing constant is not
    assert not out[11].is_anomaly


def test_null_values_never_flagged(spark):
    rows = [("k", i, 10.0 + (i % 2)) for i in range(12)] + [("k", 12, None)]
    df = spark.createDataFrame(rows, "k string, i int, v double")
    out = {r.i: r for r in rolling_zscore(
        df, "v", ["k"], "i", lookback=20, min_history=5
    ).collect()}
    assert not out[12].is_anomaly and out[12].zscore is None


def test_keys_isolated(spark):
    a = _series(spark, [9, 11] * 10 + [16], key="a")
    b = _series(spark, [100, 100] * 10 + [100], key="b")
    out = rolling_zscore(
        a.unionByName(b), "v", ["k"], "i", lookback=20, min_history=10
    )
    flagged = [(r.k, r.i) for r in out.collect() if r.is_anomaly]
    assert flagged == [("a", 20)]


def test_rolling_zscore_validates(spark):
    df = _series(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="min_history"):
        rolling_zscore(df, "v", ["k"], "i", lookback=5, min_history=6)


def test_single_shuffle_plan(spark):
    df = _series(spark, list(range(100)))
    out = rolling_zscore(df, "v", ["k"], "i")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_window_count_anomaly_volume_spike(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # 12 quiet hours of 10 events, then an hour with 100
    for h in range(12):
        rows += [("k", base + datetime.timedelta(hours=h, minutes=m * 5))
                 for m in range(10)]
    rows += [("k", base + datetime.timedelta(hours=12, seconds=s))
             for s in range(100)]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = window_count_anomaly(
        df, ["k"], "ts", window="1 hour", lookback=24, min_history=6
    )
    flagged = [r for r in out.collect() if r.is_anomaly]
    assert len(flagged) == 1
    r = flagged[0]
    assert r.n_events == 100 and r.window_start == base.replace(hour=12)
    # quiet hours are a constant series -> baseline std 0, break rule
    assert r.zscore is None and r.base_mean == 10.0
