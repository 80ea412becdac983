"""D56: one-pass Poisson bootstrap — content-addressed Poisson(1)
weights, B replica means in one aggregate, CI from sorted means."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.estimate import (
    poisson_bootstrap_ci,
    poisson_thresholds_u32,
)


def _py_weight(key, r, salt="boot"):
    # replica r reads 8-hex window r%4 of digest r//4 (4 replicas per md5)
    d = hashlib.md5(f"{key}:{r // 4}:{salt}".encode()).hexdigest()
    u = int(d[8 * (r % 4): 8 * (r % 4) + 8], 16)
    return sum(1 for t in poisson_thresholds_u32() if u >= t)


def test_thresholds_are_the_poisson_cdf():
    ts = poisson_thresholds_u32()
    assert len(ts) == 13 and ts == sorted(ts)
    # t_0 = floor(e^-1 * 2^32); the tail is within grid resolution
    assert ts[0] == int(math.exp(-1) * 2**32)
    assert ts[-1] >= 4294967294
    # mean of the induced distribution is ~1 (Poisson(1))
    probs = [ts[0] / 2**32] + [
        (ts[k] - ts[k - 1]) / 2**32 for k in range(1, 13)
    ]
    mean = sum(k * p for k, p in enumerate(probs))
    assert abs(mean - 1.0) < 1e-6


def test_matches_python_reference(spark):
    rows = [Row(k=i, g="a", v=float(10 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows)
    (got,) = poisson_bootstrap_ci(
        df, ["g"], "v", key_col="k", replicas=8, ndigits=6
    ).collect()

    sums = [0.0] * 8
    cnts = [0] * 8
    for r in rows:
        for rep in range(8):
            w = _py_weight(r.k, rep)
            sums[rep] += w * r.v
            cnts[rep] += w
    means = sorted(
        s / c for s, c in zip(sums, cnts) if c > 0
    )
    m = len(means)
    lo = means[math.floor(0.05 * (m - 1))]
    hi = means[math.ceil(0.95 * (m - 1))]
    assert got["n_rows"] == 200
    assert got["mean"] == round(sum(r.v for r in rows) / 200, 6)
    assert got["ci_lo"] == round(lo, 6)
    assert got["ci_hi"] == round(hi, 6)


def test_ci_brackets_mean_and_tightens_with_n(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    full = {
        r["event_type"]: r
        for r in poisson_bootstrap_ci(
            ev, ["event_type"], "value", key_col="event_id"
        ).collect()
    }
    for r in full.values():
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    small = {
        r["event_type"]: r
        for r in poisson_bootstrap_ci(
            ev.filter(F.col("event_id") % 50 == 0),
            ["event_type"], "value", key_col="event_id",
        ).collect()
    }
    # ~50x fewer rows => wider intervals (compare one shared type)
    t = next(iter(small))
    assert (small[t]["ci_hi"] - small[t]["ci_lo"]) > (
        full[t]["ci_hi"] - full[t]["ci_lo"]
    )


def test_single_row_group_survives_zero_weight_replicas(spark):
    df = spark.createDataFrame([Row(k=1, g="solo", v=5.0)])
    (r,) = poisson_bootstrap_ci(
        df, ["g"], "v", key_col="k", replicas=16
    ).collect()
    # replicas with w=0 drop out; surviving means are all exactly 5.0
    assert r["n_rows"] == 1 and r["ci_lo"] == 5.0 and r["ci_hi"] == 5.0


def test_deterministic_across_partitioning(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    a = sorted(map(tuple, poisson_bootstrap_ci(
        ev.repartition(2), ["event_type"], "value", key_col="event_id",
    ).collect()))
    b = sorted(map(tuple, poisson_bootstrap_ci(
        ev.repartition(17), ["event_type"], "value", key_col="event_id",
    ).collect()))
    assert a == b and a


def test_validation(spark):
    df = spark.createDataFrame([Row(k=1, g="a", v=1.0)])
    with pytest.raises(ValueError, match="replicas"):
        poisson_bootstrap_ci(df, ["g"], "v", key_col="k", replicas=1)
    with pytest.raises(ValueError, match="lo < hi"):
        poisson_bootstrap_ci(df, ["g"], "v", key_col="k", lo=0.9, hi=0.1)


def test_plan_one_exchange(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    out = poisson_bootstrap_ci(
        ev, ["event_type"], "value", key_col="event_id"
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    # B replicas ride as column width, never extra passes or shuffles
    assert p.count("Exchange") == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_all_zero_weight_group_emits_null_ci(spark):
    # ADVICE r10: a group whose every replica weight is 0 (key=3 draws
    # w=0 for both replicas under the default salt — verified by the
    # Python twin) has an empty means array; it must emit NULL CIs,
    # not throw on element_at(means, 0).
    assert _py_weight(3, 0) == 0 and _py_weight(3, 1) == 0
    df = spark.createDataFrame(
        [Row(k=3, g="dead", v=1.0), Row(k=0, g="live", v=2.0),
         Row(k=1, g="live", v=4.0)]
    )
    got = {r["g"]: r for r in poisson_bootstrap_ci(
        df, ["g"], "v", key_col="k", replicas=2
    ).collect()}
    assert got["dead"]["mean"] == 1.0
    assert got["dead"]["ci_lo"] is None and got["dead"]["ci_hi"] is None
    assert got["live"]["ci_lo"] is not None
