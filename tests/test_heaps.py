"""D72: Heaps'-law vocabulary-growth curve with a quantized log-log
exponent fit — the corpus-saturation trend."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import heaps_growth


def _py_curve(docs, n_buckets):
    m = max(d for d, _ in docs) + 1

    def bucket(i):
        return min(n_buckets - 1, int(i * n_buckets / m))

    n_docs = [0] * n_buckets
    n_tokens = [0] * n_buckets
    first: dict = {}
    for d, t in docs:
        b = bucket(d)
        n_docs[b] += 1
        toks = [w for w in t.strip().lower().split() if w]
        n_tokens[b] += len(toks)
        for w in set(toks):
            if w not in first or d < first[w]:
                first[w] = d
    new_terms = [0] * n_buckets
    for w, d in first.items():
        new_terms[bucket(d)] += 1
    rows, ct, cv = [], 0, 0
    for b in range(n_buckets):
        if n_docs[b] == 0:
            continue
        ct += n_tokens[b]
        cv += new_terms[b]
        rows.append((b, n_docs[b], n_tokens[b], new_terms[b], ct, cv))
    pts = [(r[4], r[5]) for r in rows if r[4] > 0 and r[5] > 0]
    xs = [math.floor(math.log(x) * 1_000_000) for x, _ in pts]
    ys = [math.floor(math.log(y) * 1_000_000) for _, y in pts]
    v = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = round((v * sxy - sx * sy) / (v * sxx - sx * sx), 6)
    return rows, beta


def _run(spark, docs, n_buckets=10):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs]
    )
    got = heaps_growth(df, n_buckets=n_buckets).collect()
    rows = sorted(
        (r["bucket"], r["n_docs"], r["n_tokens"], r["new_terms"],
         r["cum_tokens"], r["cum_vocab"])
        for r in got
    )
    betas = {r["heaps_beta"] for r in got}
    assert len(betas) == 1
    return rows, betas.pop()


def test_saturating_corpus_has_flat_tail(spark):
    # all docs reuse the same 5 words: vocabulary stops growing after
    # the first bucket -> beta near 0
    docs = [(i, "alpha beta gamma delta eps") for i in range(40)]
    rows, beta = _run(spark, docs, n_buckets=8)
    ref_rows, ref_beta = _py_curve(docs, 8)
    assert rows == sorted(ref_rows) and beta == ref_beta
    assert rows[0][5] == 5 and rows[-1][5] == 5  # cum vocab flat
    assert abs(beta) < 0.05


def test_fresh_corpus_grows_linearly(spark):
    # every doc contributes entirely new words -> beta near 1
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(6))) for i in range(40)
    ]
    rows, beta = _run(spark, docs, n_buckets=8)
    ref_rows, ref_beta = _py_curve(docs, 8)
    assert rows == sorted(ref_rows) and beta == ref_beta
    assert beta > 0.95


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a")])
    with pytest.raises(ValueError, match="n_buckets"):
        heaps_growth(df, n_buckets=1)


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    rows, beta = _run(spark, docs, n_buckets=20)
    ref_rows, ref_beta = _py_curve(docs, 20)
    assert rows == sorted(ref_rows)
    assert beta == ref_beta


def test_plan_bounded_fit_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = heaps_growth(df, n_buckets=20)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
