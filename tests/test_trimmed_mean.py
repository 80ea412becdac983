"""D70: per-group trimmed mean — the drop counterpart of winsorize,
exact via decimal sums and rank-based trimming."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.numeric import trimmed_mean_report


def _py_report(rows, trim):
    by_g: dict = {}
    nulls: dict = {}
    for g, v in rows:
        if v is None:
            nulls[g] = nulls.get(g, 0) + 1
        else:
            by_g.setdefault(g, []).append(Decimal(str(v)).quantize(
                Decimal("0.01")
            ))
    out = {}
    for g, vs in by_g.items():
        vs = sorted(vs)
        n = len(vs)
        k = int(n * trim)
        kept = vs[k: n - k]
        out[g] = (
            n,
            nulls.get(g, 0),
            2 * k,
            round(float(sum(vs) / n), 6),
            round(float(sum(kept) / len(kept)), 6),
        )
    return out


def _run(spark, rows, trim=0.1):
    df = spark.createDataFrame(
        [Row(g=g, v=v) for g, v in rows], "g string, v double"
    )
    return {
        r["g"]: (
            r["n_rows"], r["n_null"], r["n_trimmed"],
            r["mean_raw"], r["trimmed_mean"],
        )
        for r in trimmed_mean_report(df, "v", ["g"], trim=trim).collect()
    }


def test_outlier_moves_mean_not_trimmed_mean(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]]
    got = _run(spark, rows, trim=0.1)
    assert got == _py_report(rows, 0.1)
    n, nn, nt, mean, tmean = got["a"]
    assert (n, nn, nt) == (10, 0, 2)
    assert mean > 100          # the outlier owns the raw mean
    assert 2.0 < tmean < 9.0   # the trimmed mean shrugs it off


def test_small_groups_and_nulls(spark):
    rows = [
        ("b", 5.0), ("b", None), ("b", 7.0),   # k=0: nothing trimmed
        ("c", 1.0),                             # singleton
    ]
    got = _run(spark, rows, trim=0.2)
    assert got == _py_report(rows, 0.2)
    assert got["b"] == (2, 1, 0, 6.0, 6.0)
    assert got["c"] == (1, 0, 0, 1.0, 1.0)


def test_ties_straddling_the_cut_are_stable(spark):
    # 4 copies of the same value around the trim boundary: the kept
    # multiset is identical no matter which copies are "dropped"
    rows = [("t", v) for v in [1.0, 2.0, 2.0, 2.0, 2.0, 9.0]]
    got = _run(spark, rows, trim=0.2)
    assert got == _py_report(rows, 0.2)


def test_validation(spark):
    df = spark.createDataFrame([Row(g="x", v=1.0)])
    with pytest.raises(ValueError, match="trim"):
        trimmed_mean_report(df, "v", ["g"], trim=0.5)


def test_matches_python_twin_on_fixture(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    rows = [(r["event_type"], r["value"]) for r in ev.collect()]
    got = {
        r["event_type"]: (
            r["n_rows"], r["n_null"], r["n_trimmed"],
            r["mean_raw"], r["trimmed_mean"],
        )
        for r in trimmed_mean_report(
            ev, "value", ["event_type"], trim=0.1
        ).collect()
    }
    assert got == _py_report(rows, 0.1)


def test_plan_one_group_exchange_no_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    out = trimmed_mean_report(ev, "value", ["event_type"])
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
