"""D73: data-constrained token-budget water-filling — per-source
allocation under a repeat cap, exact integer waterline."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.pipeline import (
    token_budget_allocation,
)


def _py_alloc(rows, budget, max_epochs):
    avail: dict = {}
    for s, t in rows:
        avail[s] = avail.get(s, 0) + len(
            [w for w in t.strip().split() if w]
        )
    caps = {s: a * max_epochs for s, a in avail.items()}
    m = len(caps)
    order = sorted(caps, key=lambda s: (caps[s], s))
    pfx, n_capped, p_capped = 0, 0, 0
    for j, s in enumerate(order, 1):
        if pfx + (m - j + 1) * caps[s] <= budget:
            n_capped += 1
            p_capped += caps[s]
        pfx += caps[s]
    theta = None
    if n_capped < m:
        theta = max(0, math.floor((budget - p_capped) / (m - n_capped)))
    out = {}
    for s in caps:
        a = caps[s] if theta is None else min(caps[s], theta)
        ep = (
            math.floor(a / avail[s] * 10_000) / 10_000
            if avail[s] else None
        )
        out[s] = (avail[s], caps[s], a, ep)
    return out


def _run(spark, rows, budget, max_epochs=4):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s)
         for i, (s, t) in enumerate(rows)]
    )
    return {
        r["source"]: (
            r["avail_tokens"], r["cap_tokens"], r["alloc_tokens"],
            r["epochs"],
        )
        for r in token_budget_allocation(
            df, budget_tokens=budget, max_epochs=max_epochs
        ).collect()
    }


def test_small_source_caps_big_source_drinks_the_line(spark):
    rows = [
        ("tiny", "a b c"),                                # 3 tokens, cap 12
        ("big", " ".join(f"w{i}" for i in range(100))),   # cap 400
    ]
    got = _run(spark, rows, budget=100)
    assert got == _py_alloc(rows, 100, 4)
    # tiny is fully capped at 4 epochs; big gets the remaining line
    assert got["tiny"] == (3, 12, 12, 4.0)
    assert got["big"][2] == 88 and got["big"][3] < 1.0
    assert got["tiny"][2] + got["big"][2] <= 100


def test_budget_exceeding_caps_allocates_everything(spark):
    rows = [("a", "x y"), ("b", "p q r")]
    got = _run(spark, rows, budget=10_000)
    assert got == _py_alloc(rows, 10_000, 4)
    assert all(v[2] == v[1] for v in got.values())
    assert all(v[3] == 4.0 for v in got.values())


def test_zero_budget_allocates_zero(spark):
    rows = [("a", "x y z")]
    got = _run(spark, rows, budget=0)
    assert got["a"][2] == 0 and got["a"][3] == 0.0


def test_uniform_sources_share_equally(spark):
    rows = [(f"s{i}", "one two three four five") for i in range(5)]
    got = _run(spark, rows, budget=50)
    assert got == _py_alloc(rows, 50, 4)
    assert {v[2] for v in got.values()} == {10}


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a", source="s")])
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_allocation(df, budget_tokens=-1)
    with pytest.raises(ValueError, match="max_epochs"):
        token_budget_allocation(df, budget_tokens=1, max_epochs=0)


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    rows = [(r["source"], r["text"]) for r in df.collect()]
    for budget in (5_000, 50_000, 10_000_000):
        got = {
            r["source"]: (
                r["avail_tokens"], r["cap_tokens"], r["alloc_tokens"],
                r["epochs"],
            )
            for r in token_budget_allocation(
                df, budget_tokens=budget
            ).collect()
        }
        ref = _py_alloc(rows, budget, 4)
        assert got == ref, budget
        assert sum(v[2] for v in got.values()) <= budget or all(
            v[2] == v[1] for v in got.values()
        )


def test_plan_one_corpus_aggregate_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    out = token_budget_allocation(df, budget_tokens=50_000)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
