"""D77: word-level winnowing fingerprints — the exact-contract face of
the winnow family (md5-string window minima)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import winnow_fingerprints_words


def _py_winnow(docs, k=3, window=4):
    out = {}
    for d, t in docs:
        toks = t.strip().split()
        if len(toks) < k:
            continue
        grams = [
            hashlib.md5(" ".join(toks[i: i + k]).encode()).hexdigest()
            for i in range(len(toks) - k + 1)
        ]
        n_win = max(len(grams) - window + 1, 1)
        sel = []
        for i in range(n_win):
            m = min(grams[i: i + window])
            if m not in sel:
                sel.append(m)
        out[d] = set(sel)
    return out


def _run(spark, docs, k=3, window=4):
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    got = winnow_fingerprints_words(df, k=k, window=window).collect()
    res: dict = {}
    for r in got:
        res.setdefault(r["doc_id"], set()).add(r["fp"])
    return res


def test_matches_python_twin(spark):
    docs = [
        (0, "a b c d e f g h i j"),
        (1, "a b c"),           # exactly one gram -> one fingerprint
        (2, "x y"),             # < k tokens -> absent
        (3, " "),               # empty -> absent
        (4, "p q r s t"),       # fewer grams than window -> single window
    ]
    got = _run(spark, docs)
    ref = _py_winnow(docs)
    assert got == ref
    assert 2 not in got and 3 not in got
    assert len(got[1]) == 1 and len(got[4]) == 1


def test_shared_run_guarantees_shared_fingerprint(spark):
    # winnowing guarantee: any shared token run of >= window + k - 1
    # (= 6) tokens yields at least one shared fingerprint
    shared = "alpha beta gamma delta epsilon zeta"
    docs = [
        (0, f"one two three {shared} four five"),
        (1, f"{shared} completely different tail here"),
        (2, "unrelated text with no overlap at all whatsoever"),
    ]
    got = _run(spark, docs)
    assert got[0] & got[1], "shared 6-token run must share a fingerprint"
    assert not (got[0] & got[2])


def test_density_bound(spark):
    # expected fingerprint density ~ 2/(window+1); assert a loose cap:
    # never more fingerprints than windows
    docs = [(0, " ".join(f"w{i}" for i in range(200)))]
    got = _run(spark, docs)
    n_grams = 200 - 3 + 1
    n_windows = n_grams - 4 + 1
    assert 0 < len(got[0]) <= n_windows
    assert len(got[0]) < n_grams  # strictly compressing


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = _run(spark, docs)
    ref = _py_winnow(docs)
    assert got == ref


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    with pytest.raises(ValueError, match="k must"):
        winnow_fingerprints_words(df, k=0)
    with pytest.raises(ValueError, match="window"):
        winnow_fingerprints_words(df, window=0)


def test_plan_shuffle_free_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = winnow_fingerprints_words(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    # the only exchange is fan_out's deliberate REPARTITION (core
    # spreading before the array-heavy projection) — no aggregation
    # or join shuffle anywhere
    assert p.count("Exchange") == 1, p
    assert "REPARTITION_BY_NUM" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
