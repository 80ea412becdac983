"""D98: classifier reliability / calibration-curve report —
all-integer Python twin + canonical calibrated/miscalibrated cases."""

from __future__ import annotations

from mysql2parquet_spark.operators.classifier import calibration_report

import pytest


def _py_cal(pairs, bins=10):
    agg: dict = {}
    for p, y in pairs:
        b = min((p * bins) // 1_000_000, bins - 1)
        d = agg.setdefault(b, [0, 0, 0])
        d[0] += 1
        d[1] += y
        d[2] += p
    out = {}
    for b, (n, npos, sp) in agg.items():
        mean = sp // n
        rate = (npos * 1_000_000) // n
        out[b] = (n, npos, mean, rate, abs(mean - rate))
    return out


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(
        [(int(p), bool(y)) for p, y in pairs],
        "prob_micro bigint, y boolean",
    )
    got = calibration_report(df, "y", **kw).collect()
    return {
        r["bin"]: (
            r["n"],
            r["n_pos"],
            r["mean_prob_micro"],
            r["pos_rate_micro"],
            r["gap_micro"],
        )
        for r in got
    }


def test_matches_python_twin(spark):
    pairs = [
        (50_000, False),
        (120_000, False),
        (130_000, True),
        (450_000, False),
        (490_000, True),
        (510_000, True),
        (880_000, True),
        (930_000, True),
        (1_000_000, True),  # p = 1.0 folds into the top bucket
        (999_999, False),
    ]
    assert _run(spark, pairs) == _py_cal(pairs)


def test_perfectly_calibrated_buckets_have_zero_gap(spark):
    # bucket 2 (p in [0.2, 0.3)): mean prob 250000, 1 of 4 positive ->
    # 250000 empirical: gap 0. bucket 8 likewise at 0.75... plant both.
    pairs = [(250_000, True)] + [(250_000, False)] * 3
    pairs += [(750_000, True)] * 3 + [(750_000, False)]
    got = _run(spark, pairs)
    assert got[2][4] == 0
    assert got[7][4] == 0


def test_overconfident_bucket_shows_gap(spark):
    # 0.9-bucket that is right only half the time: gap ~ 400000
    pairs = [(900_000, True)] * 2 + [(900_000, False)] * 2
    got = _run(spark, pairs)
    assert got[9] == (4, 2, 900_000, 500_000, 400_000)


def test_bins_validation_and_override(spark):
    pairs = [(100_000, False), (900_000, True)]
    with pytest.raises(ValueError, match="bins"):
        _run(spark, pairs, bins=1)
    got = _run(spark, pairs, bins=2)
    assert set(got) == {0, 1}
